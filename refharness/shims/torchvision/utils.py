"""torchvision.utils.make_grid (the only symbol the reference imports,
main.py:38) — a faithful minimal implementation."""

from __future__ import annotations

import torch


def make_grid(tensor, nrow: int = 8, padding: int = 2,
              normalize: bool = False, value_range=None, pad_value=0.0,
              scale_each: bool = False, **_ignored):
    if isinstance(tensor, (list, tuple)):
        tensor = torch.stack(tensor)
    if tensor.dim() == 3:
        tensor = tensor.unsqueeze(0)
    tensor = tensor.clone().float()
    if normalize:
        def _norm(t, lo, hi):
            t.clamp_(min=lo, max=hi).sub_(lo).div_(max(hi - lo, 1e-5))
        if scale_each:
            for t in tensor:
                lo, hi = (value_range if value_range is not None
                          else (float(t.min()), float(t.max())))
                _norm(t, lo, hi)
        else:
            lo, hi = (value_range if value_range is not None
                      else (float(tensor.min()), float(tensor.max())))
            _norm(tensor, lo, hi)
    n, c, h, w = tensor.shape
    ncol = min(nrow, n)
    nrows = (n + ncol - 1) // ncol
    grid = tensor.new_full(
        (c, nrows * (h + padding) + padding, ncol * (w + padding) + padding),
        pad_value)
    for idx in range(n):
        r, col = divmod(idx, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[:, y:y + h, x:x + w] = tensor[idx]
    return grid
