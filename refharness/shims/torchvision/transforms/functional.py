"""torchvision.transforms.functional stand-in (hard error on use)."""


def __getattr__(name):
    raise RuntimeError(
        f"refharness torchvision shim: transforms.functional.{name} is "
        "unavailable in this environment")
