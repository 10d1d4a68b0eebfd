#!/usr/bin/env python3
"""Recompute the SURVEY close-section board numbers from archived bench
artifacts — run at round close and paste ONLY these numbers into the
SURVEY board paragraph (the r11/r12 verdicts both flagged hand-quoted
numbers that did not match the archived artifact; this makes every
quoted figure a copy of a recomputation).

Usage: tools/bench_board.py bench_archive/bench_r13.json \
           bench_archive/bench_r12.json
"""
import json
import sys


def main(cur_path: str, prev_path: str) -> None:
    cur = json.load(open(cur_path))
    prev = json.load(open(prev_path))
    qc, qp = cur["queries"], prev["queries"]
    shared = sorted(set(qc) & set(qp))
    new = sorted(set(qc) - set(qp))
    gone = sorted(set(qp) - set(qc))
    sc = sum(qc[k] for k in shared)
    sp = sum(qp[k] for k in shared)
    print(f"current board : {cur['value']:.1f} s / {len(qc)} queries "
          f"(failed: {cur.get('failed', [])})")
    print(f"shared-{len(shared)}    : {sc:.1f} s vs prev {sp:.1f} s "
          f"= {sc / sp:.3f}x raw")
    print(f"new rows ({len(new)}) : "
          f"{sum(qc[k] for k in new):.1f} s total")
    for k in sorted(new, key=lambda k: -qc[k]):
        print(f"    {k} {qc[k]:.2f}")
    if gone:
        print(f"REMOVED rows ({len(gone)}): {gone}")
    sent_c = cur.get("sentinel", {})
    sent_p = prev.get("sentinel", {})
    if sent_c and sent_p:
        pairs = [(k, sent_c[k], sent_p[k]) for k in sorted(sent_c)
                 if k in sent_p]
        print("sentinels     : " + "  ".join(
            f"{k}={c:.2f}/{p:.2f}({c / p:.2f}x)" for k, c, p in pairs))
        # r14 (verdict #6): the de-noised cross-round signal — shared-raw
        # divided by the mean sentinel ratio. The box drifts 0.9-1.5x
        # across a day (r13: driver 268.0 s vs builder 217.9 s on the
        # SAME commit); the sentinels are untouched map-only rows, so
        # their mean ratio estimates the box factor and the normalized
        # figure is the code-attributable movement.
        # the headline normalization stays on the MAP-ONLY sentinels
        # (continuity with every prior round's board figure); the class
        # block below is the finer-grained lens
        map_pairs = [(k, c, p) for k, c, p in pairs
                     if not k.startswith("sentinel_")]
        mean_sent = sum(c / p for _, c, p in map_pairs) / len(map_pairs)
        print(f"normalized    : shared {sc / sp:.3f}x raw / "
              f"{mean_sent:.3f}x sentinel-mean = "
              f"{sc / sp / mean_sent:.3f}x code-attributable")
        # r15 (r14 verdict #1): per-CLASS drift. The three map-only
        # sentinels cannot see shuffle- or codegen-heavy drift —
        # dd_semantic moved ~1.3x across rounds on byte-identical code
        # while they moved ~1.0x (BoardOrderProbe r15: JIT-warmth/
        # compile variance spreads a codegen-heavy row 4.75–6.94 s on
        # one box and one code). Bench now times two FROZEN
        # bench-internal rows of the missing classes; print each class
        # ratio so a >2 s codegen-heavy mover can be judged against
        # the codegen sentinel, not the map mean. Until both archives
        # carry them, absent classes print as n/a. Cross-round per-row
        # deltas for >2 s codegen-heavy rows carry ±30% error even
        # sentinel-normalized — treat single-row movements inside that
        # band as noise unless they repeat across independent runs.
        classes = {"map": [k for k, _, _ in pairs
                           if not k.startswith("sentinel_")],
                   "shuffle": ["sentinel_shuffle"],
                   "codegen": ["sentinel_codegen"]}
        parts = []
        for cls, names in classes.items():
            rs = [sent_c[k] / sent_p[k] for k in names
                  if k in sent_c and k in sent_p]
            parts.append(f"{cls}={sum(rs) / len(rs):.2f}x"
                         if rs else f"{cls}=n/a")
        print("class drift   : " + "  ".join(parts))
    movers = sorted(((qc[k] / qp[k], k) for k in shared
                     if qp[k] > 0.3 and qc[k] / qp[k] > 1.25),
                    reverse=True)
    print(f"regressions >1.25x (prev >0.3 s): "
          f"{[(k, f'{r:.2f}x', f'{qp[k]:.2f}->{qc[k]:.2f}') for r, k in movers[:8]]}")
    improv = sorted(((qc[k] / qp[k], k) for k in shared
                     if qp[k] > 0.5 and qc[k] / qp[k] < 0.8))
    print(f"improvements <0.8x (prev >0.5 s): "
          f"{[(k, f'{r:.2f}x') for r, k in improv[:8]]}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
