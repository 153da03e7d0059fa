"""Per-query source fingerprints → automatic reverify rotation.

Computes a stable fingerprint for every catalog query from (a) the
query function's own source, (b) its oracle SQL, and (c) the source of
every package module the function body references by name.  The
committed snapshot (`tools/query_fingerprints.json`) is the previous
round's state; at import time `catalog._reorder_registration`
front-loads queries whose live fingerprint differs, so a code change
anywhere in a query's dependency cone re-enters it into the driver's
50-query correctness window without hand-listing (VERDICT r3 item 8).

The module scan is textual by design: a query referencing
``dedup.banded_lsh_candidates`` matches token ``dedup`` and inherits
`operators/dedup.py`'s source into its hash.  False positives (a
docstring mentioning a module) only cause a harmless extra reverify;
false negatives require calling a module without naming it, which the
catalog style (module-qualified calls) rules out.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import re
from pathlib import Path

_PKG = Path(__file__).resolve().parent.parent
SNAPSHOT_PATH = str(_PKG.parent / "tools" / "query_fingerprints.json")

# Modules a query function can pull behavior from. Name → file path.
_DEP_MODULES: dict[str, Path] = {
    **{
        p.stem: p
        for p in (_PKG / "operators").glob("*.py")
        if p.stem != "__init__"
    },
    **{
        p.stem: p
        for p in (_PKG / "sources").glob("*.py")
        if p.stem != "__init__"
    },
    **{
        p.stem: p
        for p in (_PKG / "functions").glob("*.py")
        if p.stem != "__init__"
    },
    "session": _PKG / "session.py",
}

_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _module_source_cache() -> dict[str, str]:
    return {name: p.read_text() for name, p in _DEP_MODULES.items()}


def compute_fingerprints() -> dict[str, str]:
    """name → md5 fingerprint for every registered catalog query."""
    from kissmetrics_to_database_spark.plans import catalog

    srcs = _module_source_cache()
    out: dict[str, str] = {}
    for name, fn in catalog.QUERIES.items():
        try:
            fn_src = inspect.getsource(fn)
        except (OSError, TypeError):  # pragma: no cover - builtins only
            fn_src = repr(fn)
        tokens = set(_TOKEN_RE.findall(fn_src))
        deps = sorted(t for t in tokens if t in srcs)
        h = hashlib.md5()
        h.update(fn_src.encode())
        h.update(catalog.ORACLES.get(name, "<no-oracle>").encode())
        for d in deps:
            h.update(d.encode())
            h.update(srcs[d].encode())
        out[name] = h.hexdigest()
    return out


def changed_queries() -> set[str]:
    """Queries whose live fingerprint differs from the committed
    snapshot (or that have no snapshot entry).  Empty snapshot file →
    empty set, so a fresh checkout degrades to the hand-curated lists
    rather than reverifying everything."""
    try:
        with open(SNAPSHOT_PATH) as f:
            committed = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return set()
    if not committed:
        return set()
    live = compute_fingerprints()
    return {n for n, fp in live.items() if committed.get(n) != fp}
