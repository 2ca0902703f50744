"""Backend registry — the engine's UDF extension point.

Mirrors the reference's plugin surface (SURVEY.md §2.10): an abstract
backend contract (``backends/base.py:49-132``) plus a string→instance
factory for five engines (``backends/__init__.py:36-63``). Here a backend
is simply a pure callable ``(html_str) -> str`` (extracted text) registered
under a name; the hybrid router composes any (primary, precise) pair, and
``mapInPandas`` stages pick backends up by name on the executors.

Registered backends:

- ``fast``     — block segmentation + density classification (M1 analog)
- ``precise``  — DOM tree + best-subtree + rule cascade (M4 analog)
- ``naive``    — regex tag stripper (M2 analog — the deliberately simpler
  second engine that proves the registry carries more than one
  implementation; lower quality: keeps boilerplate text)

Purity contract: a backend must be a deterministic function of its input
string — no I/O, no state, no clock — or byte-identity under partitioning
breaks. (The reference's backends violated this by calling remote APIs;
``hybrid_backend.py:207-211``'s nondeterministic fallback is the scar.)
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass

from ..extract_core import canon, fast_extract_html, precise_extract_html


@dataclass(frozen=True)
class BackendSpec:
    """Backend contract (``backends/base.py:49-132`` analog): the pure
    extraction callable plus cost metadata (``base.py:62-71``:
    ``is_free`` / ``cost_per_1000_pages``) and optional per-executor
    lifecycle hooks (``base.py`` ``initialize() -> (ok, msg)`` /
    ``cleanup()``). The hooks run once per task in the extraction stages —
    the init-per-process amortization a heavy backend (a real model)
    needs; pure built-ins leave them None."""

    fn: Callable[[str], str]
    is_free: bool = True
    cost_per_1000_pages: float = 0.0
    initialize: Callable[[], tuple] | None = None
    cleanup: Callable[[], None] | None = None


_REGISTRY: dict[str, BackendSpec] = {}


def register_backend(name: str, fn: Callable[[str], str], *,
                     is_free: bool = True,
                     cost_per_1000_pages: float = 0.0,
                     initialize: Callable[[], tuple] | None = None,
                     cleanup: Callable[[], None] | None = None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"backend {name!r} already registered")
    _REGISTRY[name] = BackendSpec(fn, is_free, cost_per_1000_pages,
                                  initialize, cleanup)


def get_spec(name: str) -> BackendSpec:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown backend {name!r}; available: {sorted(_REGISTRY)}"
        ) from None


def get_backend(name: str) -> Callable[[str], str]:
    return get_spec(name).fn


def backend_cost_per_page(name: str) -> float:
    return get_spec(name).cost_per_1000_pages / 1000.0


def available_backends() -> list:
    return sorted(_REGISTRY)


# -- built-ins ---------------------------------------------------------------

def _fast(html_str: str) -> str:
    return fast_extract_html(html_str)[0]


_TAG_STRIP_RE = re.compile(
    r"<script.*?</script>|<style.*?</style>|<[^>]*>", re.S | re.I)


def _naive(html_str: str) -> str:
    """M2 analog: one-regex tag stripper. Fast, wrong-ish (keeps nav/ads) —
    exists to prove the registry dispatches, and as the honest lower bound
    in quality comparisons."""
    return canon(_TAG_STRIP_RE.sub(" ", html_str))


register_backend("fast", _fast)
# The precise slot carries the reference's paid-API unit cost as METADATA
# (gemini_backend.py:146-158: ~1000 input + 500 output tokens/page at
# $0.50/$3.00 per 1M → ~$2 per 1000 pages) so the hybrid's cost accounting
# has the same signal shape; the callable itself is local and
# deterministic. A real remote backend swaps the fn and keeps the field.
register_backend("precise", precise_extract_html,
                 is_free=False, cost_per_1000_pages=2.0)
register_backend("naive", _naive)
