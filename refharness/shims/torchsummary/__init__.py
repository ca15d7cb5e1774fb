"""torchsummary stand-in (display-only; imported at module scope by the
reference models, used only in print_model_summary)."""


def summary(model, *args, **kwargs):
    return str(model)
