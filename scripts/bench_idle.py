#!/usr/bin/env python3
"""Drift-proof idle benchmark: N full graft.Bench runs in FRESH JVMs,
merged per query into median / min / spread.

Round-12 adjudication measured three same-code idle runs spreading
89.5 -> 132.2 s total on this host; single-run idle numbers are noise
to +/-40%, so the idle artifact gates on the per-query MEDIAN across
runs (each run itself already medians 3 in-JVM samples per query).

Usage: python3 scripts/bench_idle.py OUT.json [runs=3] [sfDir]
Writes OUT.json:
  {"metric":"total","value":<sum of per-query medians>,"unit":"sec",
   "runs":N,"queries":{q:median},"queries_min":{q:min},
   "queries_spread":{q:max-min},"totals":[per-run totals],
   "canary_s":[per-run fixed-workload times],"canary_drift":max/min,
   "sf":dir}

The canary (graft.HostCanary: 32 threads x a fixed xorshift count, code
never changes) runs in its own JVM immediately before each bench run;
its time moving between runs/rounds is HOST drift by construction.
Normalization rule (COVERAGE.md): per-query deltas smaller than
canary_drift are host-attributed.
"""
import json, subprocess, sys, os, statistics

def canary(repo):
    cp = os.path.join(repo, "target/scala-2.13/classes") \
        + ":/opt/spark/jars/*"  # scala-library for the Scala runtime
    p = subprocess.run(
        ["java", "-cp", cp, "graft.HostCanary"],
        capture_output=True, text=True)
    line = next(
        (l for l in p.stdout.splitlines() if '{"canary_s"' in l), None)
    if p.returncode != 0 or line is None:
        sys.stderr.write("canary FAILED rc=%d\n%s\n" % (
            p.returncode, p.stderr[-2000:]))
        sys.exit(1)
    return json.loads(line[line.index('{"canary_s"'):])["canary_s"]

def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "BENCH_idle.json"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf, SPARK_GRAFT_CPUS="32")
    samples = []          # list of {query: sec}
    totals = []
    canaries = []
    for i in range(runs):
        canaries.append(canary(repo))
        print(f"canary {i+1}/{runs}: {canaries[-1]:.3f} s", flush=True)
        p = subprocess.run(
            ["sbt", "-batch", "runMain graft.Bench"],
            capture_output=True, text=True, env=env, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))
        # sbt prefixes stdout lines with "[info] " — find the JSON line
        # anywhere in the line, not at column 0
        line = next(
            (l for l in p.stdout.splitlines() if '{"metric"' in l), None)
        if p.returncode != 0 or line is None:
            # surface the failure instead of a bare StopIteration; the
            # completed runs' samples are written next to OUT for a
            # manual look
            sys.stderr.write(f"run {i+1}/{runs} FAILED rc={p.returncode}\n")
            sys.stderr.write(p.stderr[-4000:] + "\n")
            sys.stderr.write(p.stdout[-2000:] + "\n")
            if samples:
                with open(out + ".partial", "w") as f:
                    json.dump({"samples": samples, "totals": totals}, f)
                sys.stderr.write(f"partial samples -> {out}.partial\n")
            sys.exit(1)
        rec = json.loads(line[line.index('{"metric"'):])
        samples.append(rec["queries"])
        totals.append(rec["value"])
        print(f"run {i+1}/{runs}: total {rec['value']:.1f} s", flush=True)
    # median over the queries every run reports — a query set that
    # changed mid-protocol (rebuild between runs) fails loudly rather
    # than KeyError-ing off run 1's keys (an if, not an assert: -O must
    # not silently degrade the protocol to an intersection median)
    qs = sorted(set.intersection(*(set(s) for s in samples)))
    if any(len(s) != len(qs) for s in samples):
        sys.exit("query sets differ across runs — same-code protocol violated")
    med = {q: statistics.median(s[q] for s in samples) for q in qs}
    mn = {q: min(s[q] for s in samples) for q in qs}
    spread = {q: max(s[q] for s in samples) - mn[q] for q in qs}
    doc = {"metric": "total", "value": sum(med.values()), "unit": "sec",
           "runs": runs, "queries": med, "queries_min": mn,
           "queries_spread": spread, "totals": totals,
           "canary_s": canaries,
           "canary_drift": (max(canaries) / min(canaries))
               if canaries and min(canaries) > 0 else None,
           "sf": sf}
    with open(out, "w") as f:
        json.dump(doc, f)
        f.write("\n")
    print(f"median-of-{runs} total: {sum(med.values()):.1f} s "
          f"(run totals: {', '.join(f'{t:.1f}' for t in totals)}; "
          f"canaries: {', '.join(f'{c:.2f}' for c in canaries)})")

if __name__ == "__main__":
    main()
