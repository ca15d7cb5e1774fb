"""scienceplots stand-in: registers empty 'science'/'ieee'/'no-latex'
styles so the reference's module-scope plt.style.use (main.py:52) succeeds.
Pure styling — no effect on any computed number."""

import matplotlib.style as _mstyle

for _name in ("science", "ieee", "no-latex", "nature", "grid"):
    _mstyle.library.setdefault(_name, {})
if hasattr(_mstyle, "available"):
    _mstyle.available[:] = sorted(set(_mstyle.available) |
                                  set(_mstyle.library))
