"""Session-side helpers (used by bench.py / tests / CLI — never by library
code paths themselves)."""

from __future__ import annotations

import logging


def quiet_ray_data() -> None:
    """Silence Ray Data per-execution INFO spam + progress bars. Call after
    ray.init() from whoever owns the session."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    try:
        ctx.execution_options.verbose_progress = False
    except Exception:
        pass
    for name in ("ray.data", "ray.data._internal", "ray"):
        logging.getLogger(name).setLevel(logging.WARNING)
