#!/usr/bin/env python3
"""Diff two BENCH_DETAIL.json snapshots and flag drifting queries.

Usage: python3 scripts/bench_diff.py <old.json> <new.json> [ratio]

For every query present in both files, compares medians and flags those
whose new/old ratio exceeds the threshold (default 1.5×). Each flagged
row prints its per-rep instrumentation (gc/jit plus, when present, the
SparkListener execution counters: spill, shuffle volume, task time,
storage-eviction block counts) so a drift can be attributed to
environment pressure (spill/eviction/GC) vs an actual plan regression
in one step — the judge/driver triage loop round 5 asked for.

Exit code: 0 if nothing flagged, 1 otherwise.
"""
import json
import sys


def load(path):
    with open(path) as fh:
        # underscore-prefixed keys are run metadata (e.g. _committed_baseline),
        # not query entries
        return {k: v for k, v in json.load(fh).items() if not k.startswith("_")}


def fmt_rep(r):
    base = f"t={r['t']:.3f}s gc={r.get('gc_ms', 0)}ms jit={r.get('jit_ms', 0)}ms"
    if "task_ms" in r:
        base += (
            f" task={r['task_ms']}ms task_gc={r.get('task_gc_ms', 0)}ms"
            f" spill_mem={r.get('spill_mem_mb', 0)}MB"
            f" spill_disk={r.get('spill_disk_mb', 0)}MB"
            f" shuf_w={r.get('shuf_write_mb', 0)}MB"
            f" shuf_r={r.get('shuf_read_mb', 0)}MB"
            f" fetch_wait={r.get('fetch_wait_ms', 0)}ms"
            f" input={r.get('input_mb', 0)}MB"
            f" tasks={r.get('tasks', 0)} stages={r.get('stages', 0)}"
            f" rdd_drop={r.get('rdd_blocks_dropped', 0)}"
            f" rdd_to_disk={r.get('rdd_blocks_to_disk', 0)}"
        )
    return base


def main(old_path, new_path, ratio):
    old, new = load(old_path), load(new_path)
    shared = sorted(set(old) & set(new))
    missing_old = sorted(set(new) - set(old))
    missing_new = sorted(set(old) - set(new))
    flagged = []
    for name in shared:
        o, n = old[name]["median"], new[name]["median"]
        if o > 0 and n / o > ratio:
            flagged.append((n / o, name, o, n))
    total_old = sum(old[n]["median"] for n in shared)
    total_new = sum(new[n]["median"] for n in shared)
    print(
        f"{len(shared)} shared queries: total {total_old:.1f}s -> {total_new:.1f}s "
        f"({total_new / total_old:.2f}x)" if total_old else "no shared queries"
    )
    if missing_old:
        print(f"only in new ({len(missing_old)}): {', '.join(missing_old[:10])}"
              + (" ..." if len(missing_old) > 10 else ""))
    if missing_new:
        print(f"only in old ({len(missing_new)}): {', '.join(missing_new[:10])}"
              + (" ..." if len(missing_new) > 10 else ""))
    if not flagged:
        print(f"no query drifted beyond {ratio}x")
        return 0
    print(f"\n{len(flagged)} queries drifted beyond {ratio}x (worst first):")
    for r, name, o, n in sorted(flagged, reverse=True):
        print(f"\n== {name}: {o:.3f}s -> {n:.3f}s ({r:.2f}x)")
        for tag, snap in (("old", old[name]), ("new", new[name])):
            print(f"  {tag} reps (min {snap['min']:.3f} / max {snap['max']:.3f}):")
            for rep in snap.get("reps", []):
                print(f"    {fmt_rep(rep)}")
    return 1


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], thr))
