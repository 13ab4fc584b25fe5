"""Sidecar cache for the host-side tree/overflow startup probes.

The reference recomputes nothing at startup — its slot capacities are
compile-time constants (`/root/reference/Particles/defines.h:44-60`).
The tpu rebuild instead probes the ACTUAL initial scene host-side so
tree-P3M budgets and the auto-selected mesh never silently truncate
(app.py `-p3mnear` block) — but at 4M each `host_tree_counts` call is a
~15-25 s Morton sort + banded AABB count, and a `-p3mnear tree` launch
pays several (one per auto_grid candidate, plus the budget sizing).
This module persists those probe results keyed by everything that
determines them — (schema, N, seed, box, cutoff) identify the scene
bit-exactly, because the device init is deterministic in (N, seed)
(tested in tests/test_init.py) and the probes are pure NumPy functions
of (positions, box, r_c, gn) — so a repeat launch of the same config
skips every host sort AND the device init that feeds them.

Cache entries are invalidated wholesale by bumping _SCHEMA whenever the
probe semantics change (host_tree_counts' rule, block sizing, headroom
application sites). The file is human-readable JSON, written atomically
(tmp + rename); a corrupt or unreadable file degrades to an empty cache,
never an error.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Optional

# bump when host_tree_counts / host_overflow_count semantics change
_SCHEMA = 1


def default_path() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "multi_adapter_particles_tpu", "probes.json")


class ProbeCache:
    """One scene's probe results, load/saved from the JSON sidecar.

    `counts` maps (gn, "r_c") -> (coarse, sub_or_None, block) — the
    `host_tree_counts` triple; pass it straight to `auto_grid`'s
    `counts_cache` and reuse it for the budget sizing. `overflow` maps
    (grid, capacity) -> int. Mutate, then `save()`.
    """

    def __init__(self, path: Optional[str], n: int, seed: int,
                 box: float, cutoff: float):
        self.path = path  # None = in-memory only (cache disabled)
        self.key = f"v{_SCHEMA}|n={n}|seed={seed}|box={box!r}|cut={cutoff!r}"
        self._file: dict = {}
        self.counts: dict = {}
        self.overflow: dict = {}
        if path and os.path.exists(path):
            try:
                with open(path) as f:
                    self._file = json.load(f)
                mine = self._file.get(self.key, {})
                self.counts = {
                    self._ckey_in(k): (
                        int(v[0]),
                        None if v[1] is None else int(v[1]),
                        int(v[2]),
                    )
                    for k, v in mine.get("counts", {}).items()
                }
                self.overflow = {
                    self._okey_in(k): int(v)
                    for k, v in mine.get("overflow", {}).items()
                }
            except (OSError, ValueError, KeyError, TypeError, IndexError):
                self._file, self.counts, self.overflow = {}, {}, {}

    # counts keys are `ops.treeforce.counts_cache_key(gn, r_c)` tuples —
    # (gn:int, r_c formatted %.9g); the float goes through the SAME
    # format on both sides, so lookups are exact
    @staticmethod
    def _ckey_in(s: str):
        gn, rc = s.split("|", 1)
        return (int(gn), rc)

    @staticmethod
    def _okey_in(s: str):
        g, cap = s.split("|", 1)
        return (int(g), int(cap))

    def save(self) -> None:
        if not self.path:
            return
        self._file[self.key] = {
            "counts": {
                f"{gn}|{rc}": list(v) for (gn, rc), v in self.counts.items()
            },
            "overflow": {
                f"{g}|{c}": v for (g, c), v in self.overflow.items()
            },
        }
        try:
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
            fd, tmp = tempfile.mkstemp(
                dir=os.path.dirname(self.path), suffix=".tmp"
            )
            with os.fdopen(fd, "w") as f:
                json.dump(self._file, f, indent=1, sort_keys=True)
            os.replace(tmp, self.path)
        except OSError:
            pass  # read-only FS etc. — the cache is an optimization


def open_cache(spec: Optional[str], n: int, seed: int, box: float,
               cutoff: float) -> ProbeCache:
    """`spec`: None/"auto" -> the default sidecar path; "off" -> disabled
    (in-memory only, still deduplicates within one launch); else a path."""
    if spec == "off":
        path = None
    elif spec in (None, "auto"):
        path = default_path()
    else:
        path = spec
    return ProbeCache(path, n, seed, box, cutoff)
