#!/usr/bin/env python
"""Round-5 A/B probe: dictionary-encoding norm_name through the scoring
pair joins (VERDICT r4 task #5) vs the status-quo cascade.

Context. The cascade already ships ZERO name bytes for the two dominant
pair classes: equal-name pairs (names_equal flag, names nulled) and
_ship-failing pairs (names + arrays nulled before the Arrow boundary).
The residual string traffic is exactly ONE column crossing ONE pair-row
exchange: norm_name_l between join 1 and join 2 (it must be co-located
with norm_name_r there because `_ship` — the JVM levenshtein prefilter
that gates the 2 KB token arrays — needs both strings). And in the
broadcast regime (AQE, features side ≪ pairs — every sf-scale run and
the scaling probe) there are NO pair-row exchanges at all, so there is
nothing to dictionary-encode away.

The only restructuring that keeps every gating invariant while removing
that string from the exchange is a FOURTH pair join ("B2"): join 1
attaches sha_l only; join 2 attaches the right narrow + arrays; join 3
(new) attaches norm_name_l + token_hashes_l by left_id, after which
names_equal/_ship compute and null the wide columns; join 4 re-keys by
right_id... — i.e. trading ~20 B/pair of exchange bytes for one extra
pair-row hash join + exchange. This probe measures that trade directly,
same-hour interleaved at local[8] (the bandwidth-bound regime), in
FORCED sort-merge mode (autoBroadcastJoinThreshold=-1) — the only
regime where the string bytes exist at all.

Run: python BENCH/ab_dict_probe.py  (expects the scaling input prepared
by bench.prepare_scaling_input in $AB_WORK_DIR or prepares it fresh)
"""

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

VARIANT_CODE = r'''
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from music_dedupe_spark.session import get_spark
from music_dedupe_spark.operators import scoring
from music_dedupe_spark.operators.scoring import ScoringConfig, _kernel_schema, duplicate_decision

spark = get_spark('ab-dict', cpus=%(cpus)r, extra_conf={
    'spark.python.worker.faulthandler.enabled': 'true',
    'spark.sql.autoBroadcastJoinThreshold': '-1'})

def score_b2(pairs, features, cfg=None):
    """Variant B2: 4-join cascade — no name string on the join1->join2
    exchange (sha only); names + left arrays attach at join 3; _ship /
    names_equal compute there and null the wide columns before the
    join-4 exchange; join 4 attaches right arrays. Same kernel."""
    import numpy as np
    import pyarrow as pa
    from music_dedupe_spark.functions.similarity import name_scores_arrays
    cfg = cfg or ScoringConfig()
    sha_prefix = F.unhex(F.substring('content_sha256', 1, 32))
    left_sha = features.select(F.col('file_id').alias('file_id_l'),
                               sha_prefix.alias('content_sha256_l'))
    right = features.select(F.col('file_id').alias('file_id_r'),
                            F.col('norm_name').alias('norm_name_r'),
                            sha_prefix.alias('content_sha256_r'))
    left_wide = features.select(F.col('file_id').alias('left_id'),
                                F.col('norm_name').alias('norm_name_l'),
                                F.col('token_hashes').alias('token_hashes_l'))
    th_r = features.select(F.col('file_id').alias('right_id'),
                           F.col('token_hashes').alias('token_hashes_r'))
    ship_frac = max(1.0 - (cfg.fuzz_threshold + 0.5) / 100.0, 1.0 - cfg.min_norm_lev)
    ship = (~F.col('exact_content')) & (
        F.levenshtein('norm_name_l', 'norm_name_r')
        <= ship_frac * (F.length('norm_name_l') + F.length('norm_name_r')))
    names_equal = F.col('norm_name_l') == F.col('norm_name_r')
    joined = (pairs.select('left_id', 'right_id')
        .join(left_sha, F.col('left_id') == F.col('file_id_l'))
        .join(right, F.col('right_id') == F.col('file_id_r'))
        .withColumn('exact_content', F.col('content_sha256_l') == F.col('content_sha256_r'))
        .select('left_id', 'right_id', 'norm_name_r', 'exact_content')
        .join(left_wide, 'left_id')
        .withColumn('_ship', ship)
        .withColumn('names_equal', names_equal)
        .withColumn('norm_name_l', F.when(~names_equal, F.col('norm_name_l')))
        .withColumn('norm_name_r', F.when(~names_equal, F.col('norm_name_r')))
        .withColumn('token_hashes_l', F.when(F.col('_ship'), F.col('token_hashes_l')))
        .select('left_id', 'right_id', 'norm_name_l', 'norm_name_r',
                'exact_content', 'names_equal', '_ship', 'token_hashes_l')
        .join(th_r, 'right_id')
        .withColumn('token_hashes_r', F.when(F.col('_ship'), F.col('token_hashes_r')))
        .select('left_id', 'right_id', 'norm_name_l', 'norm_name_r',
                'exact_content', 'names_equal', 'token_hashes_l', 'token_hashes_r'))
    fuzz_th, min_jw, min_lev = cfg.fuzz_threshold, cfg.min_jaro_winkler, cfg.min_norm_lev
    def _list_views(arr):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return arr.offsets.to_numpy(zero_copy_only=False), arr.values.to_numpy(zero_copy_only=False)
    def run(batches):
        for rb in batches:
            if rb.num_rows == 0: continue
            eq = rb.column(5).to_numpy(zero_copy_only=False).astype(bool)
            fuzz = np.full(rb.num_rows, 100, dtype=np.int32)
            jw = np.ones(rb.num_rows, dtype=np.float64)
            lev = np.ones(rb.num_rows, dtype=np.float64)
            ne = ~eq
            if ne.any():
                av = np.asarray(rb.column(2).to_pylist(), dtype=object)[ne]
                bv = np.asarray(rb.column(3).to_pylist(), dtype=object)[ne]
                fuzz[ne], jw[ne], lev[ne] = name_scores_arrays(av, bv, jw_gate_lev=min(0.8, min_lev))
            exact = rb.column(4).to_numpy(zero_copy_only=False).astype(bool)
            gate = exact | (fuzz > fuzz_th) | ((jw >= min_jw) & (lev >= min_lev))
            jac = np.full(rb.num_rows, np.nan)
            off_l, val_l = _list_views(rb.column(6)); off_r, val_r = _list_views(rb.column(7))
            surv = np.flatnonzero(gate & ~exact)
            if surv.size:
                llens = off_l[surv + 1] - off_l[surv]; rlens = off_r[surv + 1] - off_r[surv]
                def gather(off, vals, lens):
                    tot = int(lens.sum())
                    if tot == 0: return np.empty(0, dtype=vals.dtype)
                    out_start = np.cumsum(lens) - lens
                    idx = np.arange(tot) + np.repeat(off[surv] - out_start, lens)
                    return vals[idx]
                sidx = np.arange(surv.size)
                pid = np.concatenate([np.repeat(sidx, llens), np.repeat(sidx, rlens)])
                vals = np.concatenate([gather(off_l, val_l, llens), gather(off_r, val_r, rlens)])
                order = np.lexsort((vals, pid))
                sv, sp = vals[order], pid[order]
                dup = (sv[1:] == sv[:-1]) & (sp[1:] == sp[:-1])
                inter = np.bincount(sp[1:][dup], minlength=surv.size)
                denom = llens + rlens - inter
                jac[surv] = np.where(denom > 0, inter / np.maximum(denom, 1), 1.0)
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), rb.column(1), pa.array(fuzz, type=pa.int32()), pa.array(jw),
                 pa.array(lev), pa.array(jac), pa.array(exact), pa.array(gate)],
                names=['left_id','right_id','fuzz_key','jw','norm_lev','jaccard','exact_content','gate_passed'])
    scored = joined.mapInArrow(run, schema=_kernel_schema(dict(pairs.dtypes)['left_id']))
    scored = scored.withColumn('jaccard', F.when(F.isnan('jaccard'), F.lit(None)).otherwise(F.col('jaccard'))) \
                   .withColumn('jw', F.when(F.isnan('jw'), F.lit(None)).otherwise(F.col('jw')))
    return scored.withColumn('is_dup', F.coalesce(duplicate_decision(cfg), F.lit(False)))

feats = spark.read.parquet(%(work)r + '/features')
pairs = spark.read.parquet(%(work)r + '/pairs')
pairs.count(); feats.count()
fn = score_b2 if %(variant)r == 'B2' else scoring.score_candidates
secs = []
for _ in range(%(runs)d):
    t0 = time.time()
    scored = fn(pairs, feats)
    row = scored.selectExpr('count(*) n', 'sum(fuzz_key) a', 'sum(jw) b',
                            'sum(norm_lev) c', 'sum(jaccard) d', 'sum(cast(is_dup as int)) e').collect()[0]
    secs.append(time.time() - t0)
print('AB_RESULT ' + json.dumps({'variant': %(variant)r, 'all': secs, 'pairs': row['n'],
                                 'checksum': [row['a'], row['e']]}))
'''


def run_variant(variant: str, cpus: str, work: str, runs: int = 3) -> dict:
    code = VARIANT_CODE % {
        "repo": REPO, "cpus": cpus, "work": work, "variant": variant, "runs": runs,
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

        work = tempfile.mkdtemp(prefix="ab_dict_")
        n = bench.prepare_scaling_input(SF_DIR, work)
        print(f"prepared {n} pairs in {work}", file=sys.stderr)
    res = {"probe": "dict-encode-names (B2 4-join) vs status-quo (A 3-join)",
           "regime": "forced sort-merge (autoBroadcastJoinThreshold=-1), local[8]",
           "rounds": []}
    for rnd in range(2):
        a = run_variant("A", "8", work)
        b = run_variant("B2", "8", work)
        res["rounds"].append({"A": a, "B2": b})
        print(f"round {rnd}: A={a['all']} B2={b['all']}", file=sys.stderr)
        assert a["pairs"] == b["pairs"], (a["pairs"], b["pairs"])
        assert a["checksum"] == b["checksum"], "variants disagree on scores!"
    alla = [s for r in res["rounds"] for s in r["A"]["all"][1:]]
    allb = [s for r in res["rounds"] for s in r["B2"]["all"][1:]]
    res["summary"] = {
        "A_median_sec": round(statistics.median(alla), 2),
        "B2_median_sec": round(statistics.median(allb), 2),
        "n_pairs": res["rounds"][0]["A"]["pairs"],
        "B2_vs_A": round(statistics.median(allb) / statistics.median(alla), 3),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
