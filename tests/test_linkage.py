"""Fellegi-Sunter record linkage: weights, blocking, guards."""

import math

from kissmetrics_to_database_spark.operators import linkage


def _docs(spark, rows):
    # rows: (doc_id, text, lang, source); n_chars derived
    return spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _expected_weight(fields, pair, agrees):
    """Replay the FS math in plain Python: u from value frequencies
    (rounded 9), weight = sum of log2(m/u) / log2((1-m)/(1-u))."""
    n = len(fields)
    w = 0.0
    for f, m in linkage.M_PROBS.items():
        freq = {}
        for rec in fields.values():
            freq[rec[f]] = freq.get(rec[f], 0) + 1
        u = round(sum(c * c for c in freq.values()) / (n * n), 9)
        if agrees[f]:
            w += math.log2(m / u)
        else:
            w += math.log2((1.0 - m) / (1.0 - u))
    return round(w, 6)


def test_linkage_weights_exact_and_pair_dedup(spark):
    # 0 and 1: same head, lang, source, band  -> strong link
    # 2 and 3: same lang/band/tok1, different source + head tail
    # 4: unrelated filler so u-probabilities aren't degenerate
    rows = [
        (0, "alpha beta gamma delta", "en", "web"),
        (1, "alpha beta gamma delta", "en", "web"),
        (2, "alpha xi yy zz qq ww e", "en", "api"),
        (3, "alpha zz ww qq yy xi e", "en", "web"),
        (4, "omega psi chi phi upsilon tau", "fr", "mail"),
    ]
    df = _docs(spark, rows)
    fields = {
        r["doc_id"]: r for r in linkage.field_table(df).collect()
    }
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in linkage.record_linkage_pairs(df, threshold=-100.0).collect()
    }
    # (0,1) agrees everywhere; matched by BOTH rules yet appears once
    assert (0, 1) in out
    r01 = out[(0, 1)]
    assert all(
        r01[c]
        for c in ("agree_lang", "agree_source", "agree_band", "agree_head")
    )
    assert r01["match_weight"] == _expected_weight(
        fields,
        (0, 1),
        {"lang": True, "source": True, "band": True, "head": True},
    )
    # (2,3): same band (equal length), same lang, same tok1 -> B2
    # candidate; disagrees on source and head
    assert (2, 3) in out
    r23 = out[(2, 3)]
    assert r23["agree_lang"] and r23["agree_band"]
    assert not r23["agree_source"] and not r23["agree_head"]
    assert r23["match_weight"] == _expected_weight(
        fields,
        (2, 3),
        {"lang": True, "source": False, "band": True, "head": False},
    )
    # thresholding keeps the strong pair, drops the weaker one
    # (tiny-corpus u-probabilities are large, so weights sit well
    # below the production threshold — cut between the two weights)
    cut = (r01["match_weight"] + r23["match_weight"]) / 2
    kept = {
        (r["doc_a"], r["doc_b"])
        for r in linkage.record_linkage_pairs(df, threshold=cut).collect()
    }
    assert (0, 1) in kept and (2, 3) not in kept


def test_linkage_max_block_guard_excludes_mega_blocks(spark):
    # 30 records sharing head AND (lang, band, tok1): with
    # max_block=10 the block is excluded by BOTH rules -> no pairs;
    # with the default guard they all pair up.
    rows = [(i, "same same same", "en", f"s{i}") for i in range(30)]
    df = _docs(spark, rows)
    assert (
        linkage.record_linkage_pairs(
            df, threshold=-100.0, max_block=10
        ).count()
        == 0
    )
    assert (
        linkage.record_linkage_pairs(df, threshold=-100.0).count()
        == 30 * 29 // 2
    )


def test_linkage_empty_head_never_blocks_on_b1(spark):
    # empty-text records must not all collide on head '' under B1;
    # they can still meet via B2 (same lang, band 0, tok1 '')
    rows = [
        (0, "", "en", "a"),
        (1, "", "fr", "b"),
        (2, "", "de", "c"),
    ]
    df = _docs(spark, rows)
    out = linkage.record_linkage_pairs(df, threshold=-100.0).collect()
    assert out == []  # different langs -> no B2 block either


def test_em_estimate_matches_plain_float_em_and_is_order_free():
    # independent plain-float EM (no nano-units) as ground truth;
    # the nano-unit + round(9) pipeline must agree to ~1e-6
    patterns = [
        {"g_lang": 1, "g_source": 1, "g_band": 1, "g_head": 1,
         "n_pairs": 20},
        {"g_lang": 1, "g_source": 0, "g_band": 1, "g_head": 0,
         "n_pairs": 300},
        {"g_lang": 0, "g_source": 0, "g_band": 1, "g_head": 0,
         "n_pairs": 80},
        {"g_lang": 1, "g_source": 1, "g_band": 0, "g_head": 1,
         "n_pairs": 5},
    ]
    lam, m, u = linkage.em_estimate(patterns, iters=5)

    flds = linkage._FIELDS
    lam2, m2, u2 = 0.1, {f: 0.9 for f in flds}, {f: 0.1 for f in flds}
    rows = [({f: p[f"g_{f}"] for f in flds}, p["n_pairs"])
            for p in patterns]
    total = sum(n for _, n in rows)
    for _ in range(5):
        nm = {f: 0.0 for f in flds}
        nu = {f: 0.0 for f in flds}
        ws = 0.0
        for g, n in rows:
            pm, pu = lam2, 1.0 - lam2
            for f in flds:
                pm *= m2[f] if g[f] else 1.0 - m2[f]
                pu *= u2[f] if g[f] else 1.0 - u2[f]
            w = pm / (pm + pu)
            ws += n * w
            for f in flds:
                if g[f]:
                    nm[f] += n * w
                    nu[f] += n * (1.0 - w)
        lam2 = ws / total
        m2 = {f: nm[f] / ws for f in flds}
        u2 = {f: nu[f] / (total - ws) for f in flds}
    assert abs(lam - lam2) < 1e-6
    for f in flds:
        assert abs(m[f] - m2[f]) < 1e-6 and abs(u[f] - u2[f]) < 1e-6
    # sanity: lambda grew toward the strong-agreement mass share
    assert 0.0 < lam < 1.0

    # order independence: reversed + rotated pattern lists give
    # BIT-identical estimates (integer accumulation)
    for perm in (list(reversed(patterns)), patterns[2:] + patterns[:2]):
        assert linkage.em_estimate(perm, iters=5) == (lam, m, u)


def test_em_params_table_serves_from_contingency(spark):
    rows = [
        (0, "alpha beta gamma delta", "en", "web"),
        (1, "alpha beta gamma delta", "en", "web"),
        (2, "alpha xi yy zz qq ww e", "en", "api"),
        (3, "alpha zz ww qq yy xi e", "en", "web"),
        (4, "omega psi chi phi upsilon tau", "fr", "mail"),
    ]
    df = _docs(spark, rows)
    out = {r["field"]: r for r in linkage.em_params_table(df).collect()}
    assert set(out) == set(linkage._FIELDS)
    pats = linkage.agreement_patterns(df).collect()
    lam, m, u = linkage.em_estimate(pats, iters=5)
    for f in linkage._FIELDS:
        assert out[f]["m_est"] == linkage._round_away(m[f], 6)
        assert out[f]["u_est"] == linkage._round_away(u[f], 6)
        assert out[f]["lambda_est"] == linkage._round_away(lam, 6)


def test_blocking_recall_catches_source_band_pairs(spark):
    # two docs agreeing on (lang, source, band) but not head/tok1 —
    # the B3-rule pair class the recall eval originally exposed
    rows = [
        (0, "alpha beta gamma delta", "en", "web"),
        (1, "zeta eta theta iotaaa2", "en", "web"),     # same len -> same band
        (2, "omega psi chi phi upsilon tau", "fr", "mail"),
        (3, "kappa mu nu xi pi rho sigma t", "de", "api"),
    ]
    df = _docs(spark, rows)
    out = {
        r["threshold"]: r
        for r in linkage.blocking_recall_eval(
            df, eval_max_id=10, thresholds=(-100.0,)
        ).collect()
    }
    r = out[-100.0]
    # ground truth = all 6 pairs; candidates must include (0,1) via B3
    assert r["n_true"] == 6
    cand = {
        (x["doc_a"], x["doc_b"])
        for x in linkage.candidate_pairs(
            linkage.field_table(df), linkage.MAX_BLOCK
        ).collect()
    }
    assert (0, 1) in cand
    assert r["n_caught"] == len(cand)
    assert r["recall"] == linkage._round_away(len(cand) / 6.0, 6)


def test_blocking_recall_null_recall_on_empty_threshold(spark):
    rows = [
        (0, "alpha beta gamma delta", "en", "web"),
        (1, "omega psi chi phi upsilon", "fr", "mail"),
    ]
    df = _docs(spark, rows)
    out = {
        r["threshold"]: r
        for r in linkage.blocking_recall_eval(
            df, eval_max_id=10, thresholds=(1000.0,)
        ).collect()
    }
    r = out[1000.0]
    assert r["n_true"] == 0 and r["n_caught"] == 0
    assert r["recall"] is None
