"""Sketch arithmetic pinned against pure-Python mirrors: the HLL
register recipe and estimator, and the count-min structural
guarantees.
"""

from __future__ import annotations

import hashlib
import math

from blackedge_ocr_spark.analysis.sketches import (
    CMS_DEPTH,
    CMS_SLOT_HEX,
    HLL_M,
    HLL_NUMER,
    HLL_P,
    HLL_RHO_CAP,
    HLL_WINDOW,
)


def _py_rho(h: str) -> int:
    win = h[HLL_P // 4 : HLL_P // 4 + HLL_WINDOW]
    zeros = len(win) - len(win.lstrip("0"))
    if zeros == HLL_WINDOW:
        return HLL_RHO_CAP
    nib = win[zeros]
    extra = 3 if nib == "1" else 2 if nib in "23" else 1 if nib in "4567" else 0
    return zeros * 4 + extra + 1


def _py_hll(terms) -> float:
    regs: dict[str, int] = {}
    for t in set(terms):
        h = hashlib.md5(t.encode()).hexdigest()
        b = h[: HLL_P // 4]
        regs[b] = max(regs.get(b, 0), _py_rho(h))
    shift = HLL_RHO_CAP
    s = sum(1 << (shift - m) for m in regs.values())
    v = HLL_M - len(regs)
    s += v * (1 << shift)
    e_raw = HLL_NUMER / float(s)
    if e_raw <= 2.5 * HLL_M and v > 0:
        lnv = math.floor(math.log(float(HLL_M) / v) * 1e6 + 0.5) / 1e6
        est = float(HLL_M) * lnv
    else:
        est = e_raw
    return math.floor(est * 1e6 + 0.5) / 1e6


def _docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_hll_matches_python_mirror_and_error_bound(spark):
    from blackedge_ocr_spark.analysis import sketches

    # two sources: small vocab (linear-counting branch) and a larger
    # one (2000 distinct terms — the raw-estimator branch)
    small = " ".join(f"word{i}" for i in range(40))
    big_terms = [f"tok{i}" for i in range(2000)]
    rows = [(0, small, "en", "s_small", len(small))]
    for j in range(20):
        chunk = " ".join(big_terms[j * 100 : (j + 1) * 100])
        rows.append((10 + j, chunk, "en", "s_big", len(chunk)))
    out = {
        r["source"]: r
        for r in sketches.hll_distinct(_docs_df(spark, rows)).collect()
    }
    assert out["s_small"]["n_exact"] == 40
    assert out["s_big"]["n_exact"] == 2000
    assert out["s_small"]["n_hll"] == _py_hll([f"word{i}" for i in range(40)])
    assert out["s_big"]["n_hll"] == _py_hll(big_terms)
    # ~1.04/sqrt(256) std error: generous 4-sigma bound
    assert out["s_big"]["rel_err"] < 0.26
    assert out["s_small"]["rel_err"] < 0.26


def test_cms_structural_guarantees(spark):
    from blackedge_ocr_spark.analysis import sketches

    # skewed corpus: one heavy term + long tail
    rows = []
    for j in range(10):
        text = " ".join(["heavy"] * 50 + [f"tail{j}_{i}" for i in range(50)])
        rows.append((j, text, "en", "s", len(text)))
    out = sketches.cms_topk(_docs_df(spark, rows)).collect()
    by_term = {r["term"]: r for r in out}
    assert by_term["heavy"]["n_exact"] == 500
    for r in out:
        assert r["n_cms"] >= r["n_exact"]  # CMS never undercounts
        assert r["overcount"] == r["n_cms"] - r["n_exact"]
    # python mirror of the heavy term's counters
    slots = {
        (i, hashlib.md5(f"{i}:heavy".encode()).hexdigest()[:CMS_SLOT_HEX])
        for i in range(CMS_DEPTH)
    }
    counts = []
    for i, slot in slots:
        c = 0
        for j in range(10):
            toks = ["heavy"] * 50 + [f"tail{j}_{k}" for k in range(50)]
            c += sum(
                1
                for t in toks
                if hashlib.md5(f"{i}:{t}".encode()).hexdigest()[:CMS_SLOT_HEX]
                == slot
            )
        counts.append(c)
    assert by_term["heavy"]["n_cms"] == min(counts)


def test_bloom_members_always_hit_and_fp_mirror(spark):
    import hashlib as _h

    from blackedge_ocr_spark.analysis import sketches
    from blackedge_ocr_spark.analysis.sketches import (
        BLOOM_DEPTH,
        BLOOM_SLOT_HEX,
    )

    rows = [
        (i, f"unique document body {i} with words {i * 7}", "en", "s", 30)
        for i in range(200)
    ]
    out = sketches.bloom_probe(_docs_df(spark, rows)).collect()
    members = [r for r in out if r["kind"] == "member"]
    absents = [r for r in out if r["kind"] == "absent"]
    assert len(members) == 200 and len(absents) == 200
    assert all(r["hit"] for r in members)          # structural: no FN
    assert all(not r["false_pos"] for r in members)
    # python mirror of the FP count on the absent probes
    def _norm(t: str) -> str:
        import re

        return re.sub(r"\s+", " ", t.lower()).strip()

    keys = [_h.md5(_norm(t).encode()).hexdigest() for _, t, *_ in rows]
    bits = {
        (i, _h.md5(f"bf{i}:{k}".encode()).hexdigest()[:BLOOM_SLOT_HEX])
        for k in keys
        for i in range(BLOOM_DEPTH)
    }
    fp = 0
    for k in keys:
        ak = _h.md5(f"{k}:absent".encode()).hexdigest()
        if all(
            (i, _h.md5(f"bf{i}:{ak}".encode()).hexdigest()[:BLOOM_SLOT_HEX])
            in bits
            for i in range(BLOOM_DEPTH)
        ):
            fp += 1
    assert sum(r["false_pos"] for r in absents) == fp
    assert fp / 200 < 0.2  # sized for an observable-but-small FP rate


def test_sampled_quantiles_matches_python_mirror(spark):
    import hashlib as _h

    from blackedge_ocr_spark.analysis import sketches
    from blackedge_ocr_spark.analysis.sketches import (
        QSAMPLE_KEEP,
        QSAMPLE_SALT,
    )

    # source 'a': 40 docs with token counts 1..40; 'b': never sampled
    # coverage is possible but unlikely to be empty at 40 docs
    rows = [
        (i, " ".join(f"w{j}" for j in range(i + 1)), "en", "a", 10)
        for i in range(40)
    ]
    rows.append((1000, "solo doc here", "en", "b", 10))
    out = sketches.sampled_quantiles(_docs_df(spark, rows)).collect()
    by = {(r["source"], r["pct"]): r for r in out}
    assert len(out) == 6  # 2 sources x 3 pcts

    def pct_cont(vals, p):
        vals = sorted(vals)
        idx = p * (len(vals) - 1)
        lo, hi = int(idx // 1), -(-idx // 1)
        import math

        v = vals[int(lo)] + (idx - lo) * (vals[int(hi)] - vals[int(lo)])
        return math.floor(v * 1e6 + 0.5) / 1e6

    sampled = [
        i + 1
        for i in range(40)
        if _h.md5(f"{QSAMPLE_SALT}{i}".encode()).hexdigest()[0]
        < f"{QSAMPLE_KEEP:x}"
    ]
    assert by[("a", 50)]["n_sample"] == len(sampled)
    for p in (50, 90, 99):
        assert by[("a", p)]["exact"] == pct_cont(list(range(1, 41)), p / 100)
        assert by[("a", p)]["est"] == pct_cont(sampled, p / 100)
    # source b: single doc, sampled or not — exact always present
    assert by[("b", 50)]["exact"] == 3.0


def test_hll_registers_merge_losslessly(spark):
    """The property that makes the register table a SKETCH: building
    registers on two disjoint halves of the corpus and max-merging
    them per (source, bucket) reproduces the single-pass register
    table EXACTLY (max is associative/commutative), so pre-aggregated
    per-partition sketch states can be stored and unioned at 100 TB
    without touching raw tokens again."""
    import pyspark.sql.functions as F

    from blackedge_ocr_spark.analysis import sketches

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = {
        (r["source"], r["bucket"]): r["m"]
        for r in sketches.hll_registers(docs).collect()
    }
    halves = [
        sketches.hll_registers(docs.filter(F.col("doc_id") % 2 == i))
        for i in (0, 1)
    ]
    merged = {}
    for h in halves:
        for r in h.collect():
            k = (r["source"], r["bucket"])
            merged[k] = max(merged.get(k, 0), r["m"])
    assert merged == full
