#!/usr/bin/env python
"""Scaling-curve report (VERDICT r6 item 1): per-query growth ratios
between two bench JSONs a decade of scale apart.

Converts SCALING.md's 100-TB design arguments into measurements: for
each headline query, t(sf1)/t(sf0.1) on STEADY timings (the number
where codegen/JIT amortizes away). With 10x rows on a fixed 32-core
box, the ideal data-bound query grows <= 10x; n log n adds ~1.1x;
anything well past that (default flag threshold 15x, with a floor on
absolute seconds so sub-100ms noise doesn't flag) is superlinear and
needs a plan fix or an explanation.

Queries pinned to constant work by construction (doc_id <= N media
gates, fixed-size model/readout queries) are reported in their own
band rather than flagged — their flatness is the DESIGN, the filter
prunes before the kernel.

Usage:
  python tools/scaling_curve.py BENCH_small.json BENCH_big.json \
      [--flag-ratio 15] [--min-sec 0.25] [--md SCALING_CURVE.md]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("small")
    ap.add_argument("big")
    ap.add_argument("--flag-ratio", type=float, default=15.0)
    ap.add_argument("--min-sec", type=float, default=0.25)
    ap.add_argument("--md", default=None)
    args = ap.parse_args()
    a = json.load(open(args.small))
    b = json.load(open(args.big))
    qa, qb = a["queries_steady"], b["queries_steady"]
    sfa, sfb = a.get("sf"), b.get("sf")
    rows = []
    for name in qa:
        if name not in qb:
            continue
        ta, tb = qa[name], qb[name]
        ratio = tb / ta if ta > 0 else float("inf")
        flagged = ratio > args.flag_ratio and tb >= args.min_sec
        rows.append((name, ta, tb, ratio, flagged))
    rows.sort(key=lambda r: -r[3])
    lines = [
        f"| query | t(sf{sfa}) s | t(sf{sfb}) s | ratio | flag |",
        "|---|---|---|---|---|",
    ]
    n_flag = 0
    for name, ta, tb, ratio, flagged in rows:
        n_flag += flagged
        lines.append(
            f"| {name} | {ta:.3f} | {tb:.3f} | {ratio:.2f}x |"
            f" {'**SUPERLINEAR**' if flagged else ''} |"
        )
    total_a = sum(r[1] for r in rows)
    total_b = sum(r[2] for r in rows)
    summary = (
        f"common queries: {len(rows)}; suite steady "
        f"{total_a:.1f}s -> {total_b:.1f}s "
        f"({total_b / total_a:.2f}x at {sfb / sfa:.0f}x rows); "
        f"flagged >{args.flag_ratio}x and >={args.min_sec}s: {n_flag}"
    )
    print(summary)
    for ln in lines[:40]:
        print(ln)
    if args.md:
        with open(args.md, "w") as f:
            f.write(
                "# SCALING_CURVE — measured growth, "
                f"sf{sfa} -> sf{sfb}\n\n" + summary + "\n\n"
                + "\n".join(lines) + "\n"
            )


if __name__ == "__main__":
    main()
