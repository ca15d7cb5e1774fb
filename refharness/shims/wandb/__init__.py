"""No-op wandb stand-in for the reference harness (refharness/). The
reference guards every use behind ``args.use_wandb`` or ``wandb.run is not
None`` (main.py:89, 222-235); the harness always runs with logging off."""

from __future__ import annotations

run = None


def login(*args, **kwargs):
    return True


def init(*args, **kwargs):
    raise RuntimeError("refharness wandb shim: run studies with "
                       "use_wandb=False")


def log(*args, **kwargs):
    pass


def finish(*args, **kwargs):
    pass


class Image:  # referenced by sample-logging paths, never built with wandb off
    def __init__(self, *args, **kwargs):
        pass


class Table:
    def __init__(self, *args, **kwargs):
        pass
