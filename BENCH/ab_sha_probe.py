#!/usr/bin/env python
"""Round-5 bytes-per-pair probe #2: 8-byte vs 16-byte sha prefix through
the scoring pair joins.

score_candidates ships an unhexed sha prefix on BOTH sides of every
candidate pair purely for the JVM exact_content equality. Round 4 cut
it 64-char hex -> 16 bytes; this probe measures halving it again to 8
bytes (false exact_content then needs two distinct contents agreeing in
64 bits among candidate pairs: ~n_pairs/2^64 = 5e-8 at 10^12 pairs —
still immaterial). No cascade copy needed: the prefix is computed from
the features' content_sha256 column, so variant C simply pre-truncates
the hex to 16 chars and the identical code path unhexes 8 bytes.

Interleaved same-hour at local[8], DEFAULT join planning (the
featureization stage is memory-bandwidth-bound even in the broadcast
regime — r3 decomposition), 2 rounds x 3 runs, first run discarded.

Reproducibility: the measured decision was ADOPTED — scoring.py now
defaults to the 8-byte prefix — so the baseline variant reconstructs
the round-4 16-byte behavior by setting scoring.SHA_PREFIX_HEX_CHARS
back to 32 (the knob exists for exactly this probe). The recorded
round-5 result is BENCH/ab_sha_r05.json (measured pre-adoption:
status-quo 16-byte code vs data-truncated 8-byte, same semantics).

Run: AB_WORK_DIR=<prepared scaling input> python BENCH/ab_sha_probe.py
"""

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

CODE = r'''
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from music_dedupe_spark.session import get_spark
from music_dedupe_spark.operators import scoring
spark = get_spark('ab-sha', cpus=%(cpus)r, extra_conf={
    'spark.python.worker.faulthandler.enabled': 'true'})
feats = spark.read.parquet(%(work)r + '/features')
# 'A' = round-4 baseline (16-byte prefix); 'C8' = 8-byte (today's
# default). scoring.SHA_PREFIX_HEX_CHARS is the width knob.
scoring.SHA_PREFIX_HEX_CHARS = 32 if %(variant)r == 'A' else 16
pairs = spark.read.parquet(%(work)r + '/pairs')
pairs.count(); feats.count()
secs = []
for _ in range(%(runs)d):
    t0 = time.time()
    scored = scoring.score_candidates(pairs, feats)
    row = scored.selectExpr('count(*) n', 'sum(fuzz_key) a', 'sum(jw) b',
                            'sum(norm_lev) c', 'sum(jaccard) d', 'sum(cast(is_dup as int)) e').collect()[0]
    secs.append(time.time() - t0)
print('AB_RESULT ' + json.dumps({'variant': %(variant)r, 'all': secs, 'pairs': row['n'],
                                 'checksum': [row['a'], row['e']]}))
'''


def run_variant(variant: str, cpus: str, work: str, runs: int = 3) -> dict:
    code = CODE % {"repo": REPO, "cpus": cpus, "work": work, "variant": variant, "runs": runs}
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(out.stdout[-2000:] + "\n" + out.stderr[-3000:])


def main():
    work = os.environ.get("AB_WORK_DIR")
    if not work:
        import bench

        work = tempfile.mkdtemp(prefix="ab_sha_")
        n = bench.prepare_scaling_input(SF_DIR, work)
        print(f"prepared {n} pairs in {work}", file=sys.stderr)
    res = {"probe": "8-byte (C8) vs 16-byte (A) sha prefix through the pair joins",
           "regime": "default planning, local[8]", "rounds": []}
    for rnd in range(2):
        a = run_variant("A", "8", work)
        c = run_variant("C8", "8", work)
        res["rounds"].append({"A": a, "C8": c})
        print(f"round {rnd}: A={a['all']} C8={c['all']}", file=sys.stderr)
        assert a["pairs"] == c["pairs"]
        assert a["checksum"] == c["checksum"], "sha narrowing changed scores!"
    alla = [s for r in res["rounds"] for s in r["A"]["all"][1:]]
    allc = [s for r in res["rounds"] for s in r["C8"]["all"][1:]]
    res["summary"] = {
        "A_median_sec": round(statistics.median(alla), 2),
        "C8_median_sec": round(statistics.median(allc), 2),
        "n_pairs": res["rounds"][0]["A"]["pairs"],
        "C8_vs_A": round(statistics.median(allc) / statistics.median(alla), 3),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
