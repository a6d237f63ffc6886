#!/usr/bin/env python
"""Round-6 bytes-per-pair probe: shuffle codec (lz4 vs zstd) and Arrow
batch size (10k vs 50k rows) through the scoring pair joins — the two
untried cheap levers VERDICT r5 named. Both change how many bytes move
per pair (codec: shuffle wire/disk bytes; batch: Arrow framing overhead
per batch), which is what a bandwidth-bound cluster pays for.

Interleaved same-hour at local[8] (the memory-bandwidth-bound regime of
the r3 decomposition), 2 rounds x 3 runs per variant, first run of each
subprocess discarded (worker spawn + JIT). Score checksums must agree
across variants — a config may not change results.

Run: AB_WORK_DIR=<prepared scaling input> python BENCH/ab_conf_r06.py
Result recorded: BENCH/ab_conf_r06.json
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

VARIANTS = {
    "lz4_b10k": {"spark.io.compression.codec": "lz4",
                 "spark.sql.execution.arrow.maxRecordsPerBatch": "10000"},
    "zstd_b10k": {"spark.io.compression.codec": "zstd",
                  "spark.sql.execution.arrow.maxRecordsPerBatch": "10000"},
    "lz4_b50k": {"spark.io.compression.codec": "lz4",
                 "spark.sql.execution.arrow.maxRecordsPerBatch": "50000"},
}

CODE = r'''
import json, sys, time
sys.path.insert(0, %(repo)r)
from music_dedupe_spark.session import get_spark
from music_dedupe_spark.operators import scoring
spark = get_spark('ab-conf', cpus=%(cpus)r, extra_conf=%(conf)r)
feats = spark.read.parquet(%(work)r + '/features')
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
    code = CODE % {
        "repo": REPO, "cpus": cpus, "work": work, "variant": variant,
        "runs": runs, "conf": VARIANTS[variant],
    }
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(out.stdout[-2000:] + "\n" + out.stderr[-3000:])


def main():
    work = os.environ.get("AB_WORK_DIR")
    if not work:
        import bench

        work = tempfile.mkdtemp(prefix="ab_conf_")
        n = bench.prepare_scaling_input(SF_DIR, work)
        print(f"prepared {n} pairs in {work}", file=sys.stderr)
    res = {"probe": "shuffle codec (lz4 vs zstd) + arrow batch (10k vs 50k) on the pair-scoring job",
           "regime": "default planning, local[8]", "rounds": []}
    for rnd in range(2):
        row = {}
        for v in VARIANTS:
            row[v] = run_variant(v, "8", work)
            print(f"round {rnd} {v}: {row[v]['all']}", file=sys.stderr)
        ref = row["lz4_b10k"]
        for v, r in row.items():
            assert r["pairs"] == ref["pairs"]
            assert r["checksum"] == ref["checksum"], f"{v} changed scores!"
        res["rounds"].append(row)
    res["summary"] = {"n_pairs": res["rounds"][0]["lz4_b10k"]["pairs"]}
    base = statistics.median(
        [s for r in res["rounds"] for s in r["lz4_b10k"]["all"][1:]]
    )
    for v in VARIANTS:
        med = statistics.median([s for r in res["rounds"] for s in r[v]["all"][1:]])
        res["summary"][f"{v}_median_sec"] = round(med, 2)
        res["summary"][f"{v}_vs_lz4_b10k"] = round(med / base, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
