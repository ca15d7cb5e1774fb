"""torchvision.transforms stand-in: importable, hard error on use (the
harness feeds tensors directly; reference get_dataset is never called)."""

from . import functional  # noqa: F401


def __getattr__(name):
    raise RuntimeError(
        f"refharness torchvision shim: transforms.{name} is unavailable — "
        "feed pre-built tensors instead of reference dataset pipelines")
