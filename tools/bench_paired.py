#!/usr/bin/env python3
"""Paired A/B bench: HEAD vs a previous commit, interleaved in the SAME
machine state — the adjudicator for "did the bench really regress, or did
the VM slow down?" (SCALE.md documents same-tree totals drifting 36.7 →
47.0 s across hours; a >1.3× round-to-round move is ambiguous without
this).

Builds REF into a git worktree under /tmp, then alternates single-pass
bench runs HEAD, REF, HEAD, REF (interleaving cancels slow machine-state
drift; min-per-tree cancels noise spikes), and merges a "paired" block
into /root/repo/BENCH_LOCAL.json:

    "paired": {"head": <sha>, "prev": <sha>, "head_total": s,
               "prev_total": s, "ratio": head/prev, "sf": <dir>}

ratio ≈ 1.0 → the trees perform the same and any BENCH_r{N} delta is
machine noise; ratio >> 1 → a real regression, bisect it.

Usage: tools/bench_paired.py <prev-ref> [sf_dir] [rounds]
"""
import json, os, re, subprocess, sys

REPO = "/root/repo"


def sh(cmd, cwd=REPO, env=None):
    return subprocess.run(cmd, shell=True, cwd=cwd, env=env,
                          capture_output=True, text=True)


def bench_run(tree, sf_dir):
    """One bench run → (total, per-query dict). SPARK_GRAFT_BENCH_PASSES
    (default 1) picks the regime: 1 = cold single-pass (cheap interleave),
    5 = the driver's warm min-of-5 (what BENCH_r{N} actually grades)."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_BENCH_PASSES=os.environ.get(
                   "SPARK_GRAFT_BENCH_PASSES", "1"))
    # remove the previous record so a failed run can't be misread as fresh
    try:
        os.remove("/root/repo/BENCH_LOCAL.json")
    except FileNotFoundError:
        pass
    r = sh('sbt -batch "runMain graft.Bench"', cwd=tree, env=env)
    # Prefer the repo-file record: Bench writes the COMPLETE per-query map
    # to BENCH_LOCAL.json (stdout is budget-truncated to the slowest rows,
    # which SELECTION-BIASES the common subset — a query one tree made fast
    # falls off that tree's line and its improvement silently leaves the
    # comparison; r20 measured common_n 48/138 under truncation).
    try:
        rec = json.load(open("/root/repo/BENCH_LOCAL.json"))
        if "queries" in rec and "value" in rec:
            return rec["value"], rec["queries"]
    except Exception:
        pass
    m = re.search(r'\{"metric".*\}', r.stdout)
    if not m:
        sys.exit(f"[paired] no bench line from {tree}:\n{r.stdout[-2000:]}")
    rec = json.loads(m.group(0))
    return rec["value"], rec.get("queries", {})


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    prev_ref = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    prev_sha = sh(f"git rev-parse --short {prev_ref}").stdout.strip()
    head_sha = sh("git rev-parse --short HEAD").stdout.strip()
    wt = f"/tmp/graft_paired_{prev_sha}"
    if not os.path.isdir(wt):
        r = sh(f"git worktree add --detach {wt} {prev_ref}")
        if r.returncode != 0:
            sys.exit(f"[paired] worktree add failed: {r.stderr}")
    print(f"[paired] building {prev_sha} in {wt}")
    r = sh("sbt -batch compile", cwd=wt)
    if r.returncode != 0:
        sys.exit(f"[paired] prev build failed:\n{r.stdout[-2000:]}")

    heads, prevs, headqs, prevqs = [], [], [], []
    for i in range(rounds):
        print(f"[paired] round {i + 1}/{rounds}: HEAD…", flush=True)
        t, q = bench_run(REPO, sf_dir)
        heads.append(t); headqs.append(q)
        print(f"[paired]   head={t:.2f}s; {prev_sha}…", flush=True)
        t, q = bench_run(wt, sf_dir)
        prevs.append(t); prevqs.append(q)
        print(f"[paired]   prev={t:.2f}s", flush=True)

    # Totals alone mislead when HEAD registers new queries (its total then
    # includes work prev never ran) — the regression verdict uses the sum
    # over the COMMON query subset. Per-query MIN across rounds per tree
    # (noise only ever adds time), then summed: min-of-sums would keep one
    # whole noisy pass, per-query minima discard noise spikes query by query.
    common = sorted(set.intersection(*[set(q) for q in headqs + prevqs]))
    # a failed query renders as -1 in the bench line; keeping it would
    # SUBTRACT from that tree's sum (e.g. a prev tree that can't read a
    # regenerated fixture would look faster the more queries it fails) —
    # per-query min over the SUCCESSFUL passes only, and a query with no
    # successful pass on either side leaves the common set
    def posmin(vals):
        ok = [v for v in vals if v is not None and v >= 0]
        return min(ok) if ok else None
    hq = {k: posmin([q.get(k) for q in headqs]) for k in common}
    pq = {k: posmin([q.get(k) for q in prevqs]) for k in common}
    dropped = [k for k in common if hq[k] is None or pq[k] is None]
    if dropped:
        print(f"[paired] dropped (failed on one side): {','.join(dropped)}")
    common = [k for k in common if k not in dropped]
    head_common, prev_common = sum(hq[k] for k in common), sum(pq[k] for k in common)
    deltas = sorted(common, key=lambda k: pq[k] - hq[k])
    print("[paired] biggest per-query deltas (head-prev, per-query min):")
    for k in deltas[:6] + deltas[-3:]:
        print(f"[paired]   {k:32s} head={hq[k]:6.2f} prev={pq[k]:6.2f} d={hq[k]-pq[k]:+.2f}")
    block = {"head": head_sha, "prev": prev_sha,
             "head_total": round(min(heads), 2),
             "prev_total": round(min(prevs), 2),
             "ratio": round(min(heads) / min(prevs), 3),
             "common_n": len(common),
             "head_common": round(head_common, 2),
             "prev_common": round(prev_common, 2),
             "common_ratio": round(head_common / prev_common, 3),
             "sf": os.path.basename(sf_dir)}
    # the last HEAD bench rewrote BENCH_LOCAL.json — merge the block in
    path = os.path.join(REPO, "BENCH_LOCAL.json")
    rec = json.load(open(path)) if os.path.exists(path) else {}
    rec["paired"] = block
    with open(path, "w") as f:
        json.dump(rec, f)
        f.write("\n")
    print(f"[paired] {json.dumps(block)}")


if __name__ == "__main__":
    main()
