"""Tagged logger (reference utils/logging_utils.py:3-23), degrading
gracefully when `rich` is unavailable."""

from __future__ import annotations

import sys
import time

try:  # rich is optional
    from rich.console import Console

    _console = Console()

    def _emit(msg: str, style: str | None) -> None:
        _console.print(msg, style=style)

except Exception:  # pragma: no cover

    def _emit(msg: str, style: str | None) -> None:
        print(msg, file=sys.stderr)


_TAG_STYLES = {
    "4DGS-SLAM": "bold green",
    "GUI": "bold magenta",
    "Eval": "bold red",
    "Bench": "bold cyan",
}

_t0 = time.time()


def Log(*args, tag: str = "4DGS-SLAM") -> None:
    msg = " ".join(str(a) for a in args)
    _emit(f"[{time.time() - _t0:8.2f}s] {tag}: {msg}", _TAG_STYLES.get(tag))
