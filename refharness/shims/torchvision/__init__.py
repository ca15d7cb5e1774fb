"""torchvision stand-in for the reference harness.

Provides exactly the surface the reference imports at module scope:
``utils.make_grid`` (real, trivial), ``models`` (pretrained towers —
raise: no weights in this environment, and equivalence studies score
through movae_tpu's weight-synced oracle tower instead), ``transforms`` /
``datasets`` (raise on use: studies feed tensors directly, never the
reference's dataset builders)."""

from . import datasets, models, transforms, utils  # noqa: F401
