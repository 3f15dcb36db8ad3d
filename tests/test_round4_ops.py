"""Round-4 operator tests: iterative-method backtest driver query."""

import math

import pytest

import numpy as np

from pyspark.sql import functions as F


@pytest.mark.slow
def test_forecast_method_backtest_complete_and_bounded(spark, sf_dir):
    """The rows-only driver query must emit exactly series × methods
    rows, all finite, with rmse >= mae, and every method's holdout MAE
    pinned below 4× the one-step-naive holdout MAE (a MASE-style,
    scale-free bound — worst observed ratio is 2.36 at sf0.001 and
    well under 1 at sf0.01, so a genuine fit-layer blowup trips this
    before it reaches the driver artifact)."""
    from pyspark.sql.window import Window

    from qrapids_forecast_r_script_spark.forecast.dispatch import METHODS
    from qrapids_forecast_r_script_spark.forecast.queries import (
        _BT_H, _metrics, forecast_method_backtest)

    rows = forecast_method_backtest(spark, sf_dir).collect()
    metrics = _metrics(spark, sf_dir)
    n_series = metrics.select("name", "index").distinct().count()
    assert len(rows) == n_series * len(METHODS)
    seen = {(r.name, r.method) for r in rows}
    assert len(seen) == len(rows)  # one row per (series, method)

    # per-series one-step-naive benchmark on the SAME holdout week
    w = Window.partitionBy("name", "index").orderBy("evaluationDate")
    pdf = (metrics.withColumn("rn", F.row_number().over(w))
           .toPandas())
    naive = {}
    for name, g in pdf.groupby("name"):
        y = g.sort_values("rn")["value"].to_numpy(dtype=float)
        naive[name] = float(np.mean(np.abs(y[-_BT_H:] - y[-_BT_H - 1])))
    for r in rows:
        assert r.n_holdout == _BT_H
        assert math.isfinite(r.mae) and math.isfinite(r.rmse), r
        assert r.rmse >= r.mae - 1e-9, r
        assert r.mae <= 4.0 * naive[r.name], (
            r.name, r.method, r.mae, naive[r.name])


def test_events_ks_drift_matches_brute_ecdf(spark, sf_dir):
    """KS stat equals a brute-force per-type ECDF recomputation on the
    driver; stats are proper fractions; early/late counts partition the
    feed on the 15-day boundary."""
    from qrapids_forecast_r_script_spark.operators.data_quality import (
        _KS_COEF, _KS_SPLIT_DAYS, events_ks_drift)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = {r.event_type: r for r in
            events_ks_drift(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d"), "value").toPandas()
    d0 = ev["d"].min()
    import datetime
    cut = d0 + datetime.timedelta(days=_KS_SPLIT_DAYS)
    for et, g in ev.groupby("event_type"):
        early = np.sort(g.loc[g["d"] < cut, "value"].to_numpy())
        late = np.sort(g.loc[g["d"] >= cut, "value"].to_numpy())
        grid = np.unique(np.concatenate([early, late]))
        fe = np.searchsorted(early, grid, side="right") / len(early)
        fl = np.searchsorted(late, grid, side="right") / len(late)
        ks = round(float(np.max(np.abs(fe - fl))), 6)
        r = rows[et]
        assert r.n_early == len(early) and r.n_late == len(late)
        assert abs(r.ks_stat - ks) < 1e-9, (et, r.ks_stat, ks)
        assert 0.0 <= r.ks_stat <= 1.0
        crit = round(_KS_COEF * ((len(early) + len(late))
                                 / (len(early) * len(late))) ** 0.5, 6)
        assert abs(r.ks_crit - crit) < 1e-9
        assert r.drift_detected == (r.ks_stat > r.ks_crit)


def test_bpe_encode_consistent_with_trainer(spark, sf_dir):
    """Every doc is covered; token counts never exceed character
    counts; total token savings equals the trainer's merged-pair mass
    (each applied merge removes exactly one symbol occurrence, so
    sum(chars) - sum(tokens) over the corpus == the number of merge
    operations performed across the 3 rounds)."""
    from qrapids_forecast_r_script_spark.operators.bpe import (
        bpe_encode_docs)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = bpe_encode_docs(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r.n_tokens <= r.n_chars
        assert r.n_tokens >= r.n_words          # >= one token per word
        assert r.compression >= 1.0
        # NOT python round(): 137/128 = 1.0703125 is an exact midpoint
        # where Python banker's-rounds down but Spark AND DuckDB round
        # half-away (they agree — the oracle hash is safe); compare
        # with a half-ulp tolerance instead
        assert abs(r.compression - r.n_chars / r.n_tokens) <= 6e-7


def test_paragraph_dedup_rewrite_brute(spark, sf_dir):
    """Brute-force Python recomputation of the block segmentation,
    first-occurrence ranks, and cleaned-text md5; plus the identity
    invariant: a doc that loses no blocks reassembles to EXACTLY its
    original text (blocks partition the token stream)."""
    import hashlib

    from qrapids_forecast_r_script_spark.operators.dedup import (
        _PARA_WORDS, paragraph_dedup_rewrite)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = {r.doc_id: r for r in
            paragraph_dedup_rewrite(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").collect()
    # global first-occurrence rank by (doc_id, block_id)
    blocks = []   # (doc_id, block_id, text, n_words)
    for d in sorted(docs, key=lambda r: r.doc_id):
        toks = d.text.split(" ")
        for b in range(0, (len(toks) + _PARA_WORDS - 1) // _PARA_WORDS):
            blk = toks[b * _PARA_WORDS:(b + 1) * _PARA_WORDS]
            blocks.append((d.doc_id, b, " ".join(blk), len(blk)))
    seen: set[str] = set()
    keep: dict[tuple[int, int], bool] = {}
    for doc_id, bid, text, _ in sorted(blocks):
        keep[(doc_id, bid)] = text not in seen
        seen.add(text)
    assert len(rows) == len(docs)
    for d in docs:
        mine = [(bid, text, nw) for doc_id, bid, text, nw in blocks
                if doc_id == d.doc_id]
        kept = [(text, nw) for bid, text, nw in mine if keep[(d.doc_id, bid)]]
        cleaned = " ".join(t for t, _ in kept)
        r = rows[d.doc_id]
        assert r.n_blocks == len(mine)
        assert r.n_removed == len(mine) - len(kept)
        assert r.n_words_kept == sum(nw for _, nw in kept)
        assert r.cleaned_md5 == hashlib.md5(cleaned.encode()).hexdigest()
        if r.n_removed == 0:     # reassembly identity
            assert cleaned == d.text


def test_doc_novelty_scores_brute(spark, sf_dir):
    """Novelty equals the brute-force unique-4-gram fraction; bounds
    hold; a doc whose text is globally unique wordage scores 1.0 iff
    none of its 4-grams appear elsewhere."""
    from qrapids_forecast_r_script_spark.operators.dedup import (
        _NOVELTY_N, doc_novelty_scores)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = {r.doc_id: r for r in doc_novelty_scores(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").collect()
    grams: dict[int, set[str]] = {}
    for d in docs:
        toks = d.text.split(" ")
        grams[d.doc_id] = {" ".join(toks[i:i + _NOVELTY_N])
                           for i in range(len(toks) - _NOVELTY_N + 1)}
    from collections import Counter
    df = Counter(g for s in grams.values() for g in s)
    for d in docs:
        gs = grams[d.doc_id]
        if not gs:
            assert d.doc_id not in rows
            continue
        uniq = sum(1 for g in gs if df[g] == 1)
        r = rows[d.doc_id]
        assert r.n_grams == len(gs)
        assert r.n_unique == uniq
        assert abs(r.novelty - round(uniq / len(gs), 6)) < 1e-9
        assert 0.0 <= r.novelty <= 1.0


def test_corpus_zipf_fit_matches_numpy_ols(spark, sf_dir):
    """Slope/intercept/R² equal a numpy polyfit over the SAME snapped
    ln points (the operator's fixed-point grid applied in the brute
    recomputation)."""
    from collections import Counter

    from qrapids_forecast_r_script_spark.operators.text_quality import (
        _ZIPF_SCALE, _ZIPF_TOP, corpus_zipf_fit)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = {r.lang: r for r in corpus_zipf_fit(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "text").collect()
    by_lang: dict[str, Counter] = {}
    for d in docs:
        c = by_lang.setdefault(d.lang, Counter())
        c.update(w for w in d.text.split(" ") if w)
    for lang, c in by_lang.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:_ZIPF_TOP]
        x = np.array([round(math.log(i + 1) * _ZIPF_SCALE)
                      for i in range(len(top))])
        y = np.array([round(math.log(n) * _ZIPF_SCALE) for _, n in top])
        slope, intercept = np.polyfit(x, y, 1)
        r = rows[lang]
        assert r.n_terms == len(top)
        assert abs(r.slope - slope) < 1e-4, (lang, r.slope, slope)
        assert abs(r.intercept - intercept / _ZIPF_SCALE) < 1e-3
        corr = np.corrcoef(x.astype(float), y.astype(float))[0, 1]
        assert abs(r.r2 - corr * corr) < 1e-4
        assert r.slope < 0           # frequency decreases with rank


def test_benford_audit_brute(spark, sf_dir):
    """Digit counts equal a Python recomputation from exact cents;
    observed shares sum to 1 (up to rounding); every expected share is
    the Benford literal."""
    from collections import Counter

    from qrapids_forecast_r_script_spark.operators.data_quality import (
        _BENFORD_EXP, benford_first_digit_audit)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = benford_first_digit_audit(spark, sf_dir).collect()
    prices = [r.o_totalprice for r in
              load_table(spark, sf_dir, "orders")
              .select("o_totalprice").collect() if r.o_totalprice > 0]
    expect = Counter(int(str(round(p * 100))[0]) for p in prices)
    assert {r.digit: r.n_obs for r in rows} == dict(expect)
    assert abs(sum(r.share_obs for r in rows) - 1.0) < 1e-4
    n = sum(expect.values())
    for r in rows:
        assert r.share_exp == _BENFORD_EXP[r.digit]
        e = r.share_exp * n
        assert abs(r.chi2_contrib - (r.n_obs - e) ** 2 / e) < 1e-4


def test_char_trigram_lang_classifier_brute(spark, sf_dir):
    """Predictions equal a full Python NB recomputation (same smoothing,
    same fixed-point snapping, same tie-break)."""
    from collections import Counter, defaultdict

    from qrapids_forecast_r_script_spark.operators.training_prep import (
        _LID_K, _LID_N, char_trigram_lang_classifier)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = {r.doc_id: r for r in
            char_trigram_lang_classifier(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text").collect()

    def tris(text):
        out = []
        for w in text.split(" "):
            out += [w[i:i + _LID_N] for i in range(len(w) - _LID_N + 1)]
        return out

    counts: dict[str, Counter] = defaultdict(Counter)
    for d in docs:
        counts[d.lang].update(tris(d.text))
    vocab = {t for c in counts.values() for t in c}
    totals = {lang: sum(c.values()) for lang, c in counts.items()}
    nd = Counter(d.lang for d in docs)
    w6 = {(lang, t): round(math.log((counts[lang][t] + _LID_K)
                                    / (totals[lang] + _LID_K * len(vocab)))
                           * 1e6)
          for lang in counts for t in vocab}
    prior6 = {lang: round(math.log(nd[lang] / len(docs)) * 1e6)
              for lang in counts}
    for d in docs:
        dt = Counter(tris(d.text))
        scores = {lang: prior6[lang]
                  + sum(n * w6[(lang, t)] for t, n in dt.items())
                  for lang in counts}
        pred = min(scores, key=lambda c: (-scores[c], c))
        r = rows[d.doc_id]
        assert r.predicted_lang == pred, (d.doc_id, r.predicted_lang, pred)
        assert abs(r.nb_score - round(scores[pred] / 1e6, 6)) < 1e-9
        assert r.correct == (pred == d.lang)


def test_rm3_expansion_invariants(spark, sf_dir):
    """Ranks are contiguous from 1, scores non-increasing, the query
    doc never retrieves itself, expansion count ≤ 10, and stage-2
    output is deterministic across two runs."""
    from qrapids_forecast_r_script_spark.operators.text import (
        _BM25_N_QUERIES, _RM3_FB_TERMS, _RM3_TOP_K, rm3_query_expansion)

    a = rm3_query_expansion(spark, sf_dir).collect()
    b = rm3_query_expansion(spark, sf_dir).collect()
    assert a == b
    byq: dict[int, list] = {}
    for r in a:
        byq.setdefault(r.query_id, []).append(r)
        assert r.neighbor_id != r.query_id
        assert 0 < r.n_expansion_terms <= _RM3_FB_TERMS
    assert set(byq) == set(range(_BM25_N_QUERIES))
    for q, rs in byq.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _RM3_TOP_K
        scores = [r.rm3_score for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_link_prediction_brute(spark, sf_dir):
    """Adamic-Adar scores equal a brute-force recomputation over the
    collected LSH pair graph."""
    from collections import defaultdict

    from qrapids_forecast_r_script_spark.operators.dedup import (
        minhash_lsh_pairs)
    from qrapids_forecast_r_script_spark.operators.graph import (
        doc_graph_link_prediction)

    got = doc_graph_link_prediction(spark, sf_dir).collect()
    pairs = {(r.doc_a, r.doc_b) for r in
             minhash_lsh_pairs(spark, sf_dir)
             .select("doc_a", "doc_b").collect()}
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    scores = {}
    for u in adj:
        for w in adj:
            if u >= w:
                continue
            common = adj[u] & adj[w]
            if common:
                s6 = sum(round(1e6 / math.log(len(adj[v]))) for v in common)
                scores[(u, w)] = (len(common), s6)
    expect = sorted(scores.items(),
                    key=lambda kv: (-kv[1][1], kv[0]))[:20]
    assert len(got) == len(expect)
    for r, ((u, w), (nc, s6)) in zip(got, expect):
        assert (r.doc_a, r.doc_b) == (u, w)
        assert r.n_common == nc
        assert r.is_edge == ((u, w) in pairs)
        assert abs(r.adamic_adar - round(s6 / 1e6, 6)) < 1e-9


def test_mixture_waterfill_brute_and_invariants(spark, sf_dir):
    """Allocation equals the Python water-filling recomputation; the
    budget is never exceeded; what's left unallocated after the rounds
    is smaller than the number of active sources (integer-div dust) or
    every source is capped."""
    from qrapids_forecast_r_script_spark.operators.curation import (
        _WF_BUDGET_DEN, _WF_BUDGET_NUM, _WF_ROUNDS,
        mixture_waterfill_budget)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = {r.source: r for r in
            mixture_waterfill_budget(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "text").collect()
    avail: dict[str, int] = {}
    for d in docs:
        avail[d.source] = avail.get(d.source, 0) + len(d.text.split(" "))
    budget = sum(avail.values()) * _WF_BUDGET_NUM // _WF_BUDGET_DEN
    alloc = {s: 0 for s in avail}
    rem = budget
    for _ in range(_WF_ROUNDS):
        active = [s for s in avail if alloc[s] < avail[s]]
        if not active:
            break
        share = rem // len(active)
        gives = {s: min(avail[s] - alloc[s], share) for s in active}
        for s, g in gives.items():
            alloc[s] += g
        rem -= sum(gives.values())
    assert set(rows) == set(avail)
    for s in avail:
        r = rows[s]
        assert r.n_tokens_available == avail[s]
        assert r.n_tokens_allocated == alloc[s]
        assert r.capped == (alloc[s] == avail[s])
    total_alloc = sum(r.n_tokens_allocated for r in rows.values())
    assert total_alloc <= budget
    active = [s for s in avail if alloc[s] < avail[s]]
    assert (not active) or budget - total_alloc < len(active)


def test_jl_distortion_matches_numpy(spark, sf_dir):
    """Per-pair distances and distortion equal a numpy recomputation
    with the same seeded ±1 matrix; the average distortion over the 32
    pairs concentrates near 1 (the JL guarantee the operator audits)."""
    from qrapids_forecast_r_script_spark.operators.similarity import (
        _JL_DIM, _JL_PAIRS, _jl_signs, jl_projection_distortion)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = {r.pair_id: r for r in
            jl_projection_distortion(spark, sf_dir).collect()}
    assert len(rows) == _JL_PAIRS
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64)
           for r in load_table(spark, sf_dir, "embeddings")
           .where(f"vec_id < {2 * _JL_PAIRS}").collect()}
    R = np.array(_jl_signs())
    for i in range(_JL_PAIRS):
        d = emb[2 * i] - emb[2 * i + 1]
        orig = float(np.sqrt(d @ d))
        proj = float(np.sqrt((R @ d) @ (R @ d) / _JL_DIM))
        r = rows[i]
        assert abs(r.dist_orig - round(orig, 6)) < 1e-9
        assert abs(r.dist_proj - round(proj, 6)) < 2e-6
        assert abs(r.distortion - proj ** 2 / orig ** 2) < 1e-4
    mean_dist = np.mean([r.distortion for r in rows.values()])
    assert 0.6 < mean_dist < 1.5


def test_series_acf_matches_numpy(spark, sf_dir):
    """ACF values equal numpy's textbook estimator (full-series mean,
    c_k/c_0); every |acf| ≤ 1; the white-noise band is 1.96/√n."""
    from qrapids_forecast_r_script_spark.forecast.queries import (
        _ACF_MAX_LAG, _metrics, series_acf)

    rows = series_acf(spark, sf_dir).collect()
    pdf = _metrics(spark, sf_dir).toPandas()
    for (name, _), g in pdf.groupby(["name", "index"]):
        y = g.sort_values("evaluationDate")["value"].to_numpy(dtype=float)
        mu = y.mean()
        c0 = float(((y - mu) ** 2).sum())
        mine = {r.lag: r for r in rows if r.name == name}
        assert set(mine) == set(range(1, _ACF_MAX_LAG + 1))
        for k in range(1, _ACF_MAX_LAG + 1):
            ck = float(((y[k:] - mu) * (y[:-k] - mu)).sum())
            r = mine[k]
            assert abs(r.acf - round(ck / c0, 6)) < 1e-6, (name, k)
            assert abs(r.acf) <= 1.0 + 1e-9
            assert abs(r.wn_band - round(1.96 / math.sqrt(len(y)), 6)) \
                < 1e-9
            assert r.significant == (abs(r.acf) > r.wn_band)


def test_media_dhash_neardup_brute(spark, sf_dir):
    """Full brute-force recomputation: per-doc dHash, band-candidate
    set, exact hamming, top-20 ordering — and the banding theorem
    (hamming ≤ 5 ⇒ the pair IS a candidate) spot-checked over all
    hash pairs."""
    from itertools import combinations

    from qrapids_forecast_r_script_spark.operators.multimodal import (
        _DH_BANDS, _DH_TOP, _dhash_of_tokens, media_dhash_neardup)
    from qrapids_forecast_r_script_spark.sources import load_table

    got = media_dhash_neardup(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").collect()
    hashes = {}
    for d in docs:
        toks = [t for t in d.text.split(" ") if t]
        if toks:
            hashes[d.doc_id] = _dhash_of_tokens(toks)[1]

    def bands(h):
        return {(b, (h >> (10 * b)) & 1023) for b in range(_DH_BANDS)}

    cand = []
    for a, b in combinations(sorted(hashes), 2):
        ham = bin(hashes[a] ^ hashes[b]).count("1")
        if bands(hashes[a]) & bands(hashes[b]):
            cand.append((ham, a, b))
        else:
            assert ham > 5, (a, b, ham)   # pigeonhole guarantee
    expect = sorted(cand)[:_DH_TOP]
    assert [(r.hamming, r.media_a, r.media_b) for r in got] == expect


def test_curriculum_order_brute(spark, sf_dir):
    """Stages partition by length terciles (every doc in stage s is no
    longer than any doc in stage s+1 up to the ntile remainder
    contract), positions are the 1..N permutation ordered by (stage,
    md5 shuffle), and the within-stage order is NOT length-sorted (the
    shuffle did something)."""
    import hashlib

    from qrapids_forecast_r_script_spark.operators.curation import (
        curriculum_order)

    rows = curriculum_order(spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r.position for r in rows) == list(range(1, n + 1))
    # stage boundaries: ntile over (n_tokens, doc_id)
    order = sorted(rows, key=lambda r: (r.n_tokens, r.doc_id))
    base, rem = divmod(n, 3)
    sizes = [base + (1 if i < rem else 0) for i in range(3)]
    i = 0
    for stage, sz in enumerate(sizes, start=1):
        for r in order[i:i + sz]:
            assert r.stage == stage, (r.doc_id, r.stage, stage)
        i += sz
    # positions follow (stage, md5('curr'||doc_id), doc_id)
    def key(r):
        return (r.stage,
                hashlib.md5(f"curr{r.doc_id}".encode()).hexdigest(),
                r.doc_id)
    assert [r.doc_id for r in sorted(rows, key=key)] == \
        [r.doc_id for r in sorted(rows, key=lambda r: r.position)]
    # the shuffle actually permutes within stages
    s1 = [r.n_tokens for r in sorted(rows, key=lambda r: r.position)
          if r.stage == 1]
    assert s1 != sorted(s1)


def test_croston_matches_numpy_ses(spark, sf_dir):
    """The integer-exact alpha=0.5 closed form must equal a literal
    numpy SES recursion (l_k = a*y_k + (1-a)*l_{k-1}, l_1 = y_1) over
    the same truncated demand window, and SBA = 0.75 * Croston."""
    from qrapids_forecast_r_script_spark.forecast.queries import (
        _CR_CAP, _CR_MOD, _CR_RES, forecast_croston_events)
    from qrapids_forecast_r_script_spark.sources import load_table

    got = {r.name: r for r in
           forecast_croston_events(spark, sf_dir).collect()}
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("user_id") % _CR_MOD == _CR_RES)
          .groupBy("event_type", F.to_date("ts").alias("d"))
          .agg(F.count(F.lit(1)).alias("z"))
          .collect())
    d0 = min(r.d for r in ev)
    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(
            ((r.d - d0).days, r.z))

    def ses(ys):
        l = float(ys[0])
        for y in ys[1:]:
            l = 0.5 * y + 0.5 * l
        return l

    assert set(got) == set(by_type)
    for name, td in by_type.items():
        td.sort()
        ts = [t for t, _ in td]
        zs = [z for _, z in td]
        ps = [ts[0] + 1] + [ts[i] - ts[i - 1] for i in range(1, len(ts))]
        zk, pk = zs[-_CR_CAP:], ps[-_CR_CAP:]
        r = got[name]
        assert r.m_demands == len(zs)
        assert r.k_used == len(zk)
        assert abs(r.z_hat - ses(zk)) < 1e-6, name
        assert abs(r.p_hat - ses(pk)) < 1e-6, name
        assert abs(r.croston_rate - ses(zk) / ses(pk)) < 1e-6, name
        assert abs(r.sba_rate - 0.75 * r.croston_rate) < 2e-6, name


def test_hierarchical_coherence_invariants(spark, sf_dir):
    """Bottom-up total equals the sum of leaf forecasts exactly (both
    live on the same micro-grid); top-down leaves re-aggregate to the
    direct total within per-leaf rounding; leaves keep their direct
    forecast under bottom-up."""
    from qrapids_forecast_r_script_spark.forecast.queries import (
        hierarchical_forecast_coherence)

    rows = hierarchical_forecast_coherence(spark, sf_dir).collect()
    leaves = [r for r in rows if r.level == "leaf"]
    totals = {r.step: r for r in rows if r.level == "total"}
    assert len(totals) == 7
    by_step = {}
    for r in leaves:
        by_step.setdefault(r.step, []).append(r)
    for step, grp in by_step.items():
        t = totals[step]
        # bottom-up: exact (micro-grid sums)
        assert abs(sum(r.reconciled_bu for r in grp) - t.reconciled_bu) \
            < 1e-6 * len(grp)
        # top-down re-aggregates to the direct total (per-leaf 6dp round)
        if t.direct is not None:
            td = [r.reconciled_td for r in grp if r.reconciled_td
                  is not None]
            assert abs(sum(td) - t.direct) < 5e-6 * len(grp)
        for r in grp:
            if r.direct is not None:
                assert r.reconciled_bu == r.direct
            else:
                assert r.reconciled_bu == 0.0


def test_kcore_brute(spark, sf_dir):
    """The unrolled 3-round peel must equal a literal Python peel of the
    same graph, and the in-core subgraph must satisfy the k-core
    property (every surviving node has >= k surviving neighbors) when
    the peel has converged within the unrolled rounds."""
    from qrapids_forecast_r_script_spark.operators.dedup import (
        minhash_lsh_pairs)
    from qrapids_forecast_r_script_spark.operators.graph import (
        _KC_K, _KC_ROUNDS, doc_graph_kcore)

    got = {r.doc_id: r for r in doc_graph_kcore(spark, sf_dir).collect()}
    edges = [(r.doc_a, r.doc_b) for r in
             minhash_lsh_pairs(spark, sf_dir)
             .select("doc_a", "doc_b").collect()]
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert set(got) == set(adj)
    alive = set(adj)
    peel = {}
    for r in range(1, _KC_ROUNDS + 1):
        dead = {v for v in alive
                if len(adj[v] & alive) < _KC_K}
        for v in dead:
            peel[v] = r
        alive -= dead
        if not dead:
            break
    for v, rec in got.items():
        assert rec.deg0 == len(adj[v])
        assert rec.peel_round == peel.get(v, 0), v
        assert rec.in_core == (v in alive or peel.get(v, 0) == 0
                               and v in alive) or rec.in_core == \
            (rec.peel_round == 0)
    # converged ⇒ genuine k-core
    still = {v for v in alive if len(adj[v] & alive) < _KC_K}
    if not still:
        for v in alive:
            assert len(adj[v] & alive) >= _KC_K


def test_mmr_greedy_brute(spark, sf_dir):
    """The relational unrolled greedy must equal a literal Python MMR
    (lambda=0.5) over the same micro-grid scores, and diversify: from
    round 2 on, each pick's max-sim-to-selected enters the score."""
    import numpy as np

    from qrapids_forecast_r_script_spark.operators.similarity import (
        _MMR_SELECT, _MMR_SHORTLIST, _MMR_U, mmr_diversified_topk)
    from qrapids_forecast_r_script_spark.sources import load_table

    got = (mmr_diversified_topk(spark, sf_dir)
           .orderBy("order_idx").collect())
    emb = {r.vec_id: np.array(r.embedding, dtype=float)
           for r in load_table(spark, sf_dir, "embeddings").collect()}
    qid = min(emb)
    qv = emb[qid]

    def cos_u(a, b):
        c = float(a @ b / (np.sqrt(a @ a) * np.sqrt(b @ b)))
        return int(np.round(np.round(c, 6) * _MMR_U))

    rel = {i: cos_u(qv, v) for i, v in emb.items() if i != qid}
    short = sorted(rel, key=lambda i: (-rel[i], i))[:_MMR_SHORTLIST]
    sel = [min(short, key=lambda i: (-rel[i], i))]
    expect = [(1, sel[0], rel[sel[0]], rel[sel[0]])]
    for r in range(2, _MMR_SELECT + 1):
        rem = [i for i in short if i not in sel]
        scored = {i: rel[i] - max(cos_u(emb[i], emb[s]) for s in sel)
                  for i in rem}
        pick = min(rem, key=lambda i: (-scored[i], i))
        expect.append((r, pick, rel[pick], scored[pick]))
        sel.append(pick)
    assert [(r.order_idx, r.vec_id) for r in got] == \
        [(o, v) for o, v, _, _ in expect]
    for r, (_, _, ru, mu) in zip(got, expect):
        assert abs(r.relevance - ru / _MMR_U) < 1e-9
        # mmr_u/2 can land on the half-grid (odd integer / 2e6), which
        # the query's 6dp round snaps — allow half a grid step
        assert abs(r.mmr_score - mu / (2 * _MMR_U)) <= 5.1e-7
    # the diversified order differs from pure relevance order
    pure = sorted(short, key=lambda i: (-rel[i], i))[:_MMR_SELECT]
    assert [v for _, v, _, _ in expect] != pure or len(set(
        tuple(np.round(v, 3)) for v in emb.values())) < len(emb)


def test_chi_square_brute(spark, sf_dir):
    """Grid completeness (full r x c incl. zero cells), exact marginals,
    and the statistic equal to a literal numpy chi-square computation
    within the micro-grid floor discipline."""
    import numpy as np

    from qrapids_forecast_r_script_spark.operators.data_quality import (
        chi_square_independence)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = chi_square_independence(spark, sf_dir).collect()
    ev = (load_table(spark, sf_dir, "events")
          .select("event_type", (F.dayofweek("ts") - 1).alias("dow"))
          .collect())
    types = sorted({r.event_type for r in ev})
    dows = sorted({r.dow for r in ev})
    assert len(rows) == len(types) * len(dows)
    obs = {(t, d): 0 for t in types for d in dows}
    for r in ev:
        obs[(r.event_type, r.dow)] += 1
    n = len(ev)
    chi2 = 0.0
    for r in rows:
        assert r.observed == obs[(r.event_type, r.dow)]
        rt = sum(obs[(r.event_type, d)] for d in dows)
        ct = sum(obs[(t, r.dow)] for t in types)
        exp = rt * ct / n
        assert abs(r.expected - exp) < 1e-5
        contrib = (r.observed - exp) ** 2 / exp
        assert abs(r.contribution - contrib) < 2e-6
        chi2 += np.floor(contrib * 1e6) / 1e6
        assert r.dof == (len(types) - 1) * (len(dows) - 1)
    assert abs(rows[0].chi2_total - chi2) < 1e-4


def test_imputation_identities(spark, sf_dir):
    """The fill value is the present-value mean; the post-imputation
    mean equals (present_sum + n_missing*fill)/n_total and moves toward
    the fill value; miss rate is n_missing/n_total; ~10% masked."""
    from qrapids_forecast_r_script_spark.operators.data_quality import (
        missing_value_imputation)

    rows = missing_value_imputation(spark, sf_dir).collect()
    tot = sum(r.n_total for r in rows)
    miss = sum(r.n_missing for r in rows)
    assert 0.03 < miss / tot < 0.2      # md5 bucket ~10%
    for r in rows:
        assert abs(r.miss_rate - r.n_missing / r.n_total) < 1e-6
        n_present = r.n_total - r.n_missing
        # reconstruct present_sum from the reported fill value
        present_sum = r.fill_value * n_present
        post = (present_sum + r.n_missing * r.fill_value) / r.n_total
        assert abs(r.post_imputation_mean - post) < 1e-4
        # imputing with the present mean leaves the mean at the
        # present mean (sanity of the closed form)
        assert abs(r.post_imputation_mean - r.fill_value) < 1e-4


def test_doremi_weights_brute(spark, sf_dir):
    """Weights renormalize to 1, the update is the literal
    exponentiated-gradient formula from the per-source losses, and a
    source with above-average loss gains weight relative to its base
    share (eta > 0) while a below-average one loses."""
    from qrapids_forecast_r_script_spark.operators.curation import (
        _DRM_ETA, doremi_domain_weights)

    rows = doremi_domain_weights(spark, sf_dir).collect()
    assert abs(sum(r.new_weight for r in rows) - 1.0) < 1e-4
    docs_total = sum(r.n_docs for r in rows)
    corpus_loss = sum(r.mean_loss * r.n_docs for r in rows) / docs_total
    import math
    raw = {r.source: r.base_share * math.exp(_DRM_ETA * r.excess_loss)
           for r in rows}
    z = sum(raw.values())
    for r in rows:
        assert abs(r.excess_loss - (r.mean_loss - corpus_loss)) < 5e-6
        assert abs(r.new_weight - raw[r.source] / z) < 5e-6
        if r.excess_loss > 1e-3:
            assert r.new_weight > r.base_share * (1 - 5e-4), r
        if r.excess_loss < -1e-3:
            assert r.new_weight < r.base_share * (1 + 5e-4), r


def test_logrank_brute(spark, sf_dir):
    """Statistic equals a literal per-day hypergeometric recomputation
    from the collected user frame; the A/A hash split comes back
    not-significant; event totals partition the converters."""
    import math

    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import _LR_CRIT, logrank_cohort_test
    from qrapids_forecast_r_script_spark.sources import load_table

    row = logrank_cohort_test(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    ev = (load_table(spark, sf_dir, "events")
          .groupBy("user_id")
          .agg(F.min(F.to_date("ts")).alias("d0"),
               F.max(F.to_date("ts")).alias("d1"),
               F.min(F.when(F.col("event_type") == "purchase",
                            F.to_date("ts"))).alias("p0"))
          .collect())
    import hashlib
    users = []
    for u in ev:
        arm = int(hashlib.md5(str(u.user_id).encode())
                  .hexdigest()[:8], 16) % 2
        t = ((u.p0 or u.d1) - u.d0).days
        users.append((t, u.p0 is not None, arm))
    n_a = sum(1 for _, _, a in users if a == 0)
    n_b = len(users) - n_a
    assert (r.n_users_a, r.n_users_b) == (n_a, n_b)
    times = sorted({t for t, _, _ in users})
    at1, at2 = n_a, n_b
    o1 = e1 = v = 0.0
    for t in times:
        d1 = sum(1 for tt, c, a in users if tt == t and c and a == 0)
        d2 = sum(1 for tt, c, a in users if tt == t and c and a == 1)
        l1 = sum(1 for tt, _, a in users if tt == t and a == 0)
        l2 = sum(1 for tt, _, a in users if tt == t and a == 1)
        n, d = at1 + at2, d1 + d2
        if d > 0:
            p1 = at1 / n
            o1 += d1
            e1 += round(d * p1 * 1e6) / 1e6
            if n > 1:
                v += round(d * p1 * (1 - p1) * (n - d) / (n - 1)
                           * 1e6) / 1e6
        at1 -= l1
        at2 -= l2
    assert r.events_a == o1
    assert abs(r.o_minus_e - (o1 - e1)) < 1e-5
    assert abs(r.variance - v) < 1e-5
    z = (o1 - e1) / math.sqrt(v)
    assert abs(r.z - z) < 1e-4
    assert abs(r.chi2 - z * z) < 1e-3
    assert r.significant == (r.chi2 > _LR_CRIT)
    assert not r.significant     # A/A must not reject


def test_nb_calibration_invariants(spark, sf_dir):
    """Deciles tile the corpus evenly (ntile contract), probabilities
    are proper, positive rates are monotone-ish in score (top decile
    >= bottom decile — the classifier separates), and per-decile gap
    equals mean_pred − pos_rate."""
    from qrapids_forecast_r_script_spark.operators.training_prep import (
        _CAL_BINS, nb_calibration_curve)

    rows = sorted(nb_calibration_curve(spark, sf_dir).collect(),
                  key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, _CAL_BINS + 1))
    n = sum(r.n_docs for r in rows)
    base, rem = divmod(n, _CAL_BINS)
    assert sorted(r.n_docs for r in rows) == sorted(
        base + (1 if i < rem else 0) for i in range(_CAL_BINS))
    for r in rows:
        assert 0.0 <= r.mean_predicted <= 1.0
        assert 0.0 <= r.positive_rate <= 1.0
        assert abs(r.calibration_gap
                   - (r.mean_predicted - r.positive_rate)) < 2e-6
    assert rows[-1].positive_rate >= rows[0].positive_rate
    # sigmoid is monotone in the score, so mean_predicted is strictly
    # ordered across deciles
    preds = [r.mean_predicted for r in rows]
    assert preds == sorted(preds)


def test_conformal_coverage_near_target(spark, sf_dir):
    """Coverage is a proper fraction over exactly the 7 held-out steps
    per series, the gap column is consistent, and mean coverage across
    series is within a binomial-noise band of the 0.9 target (7 points
    x few series -> wide band, but a broken interval construction
    lands at 0 or 1)."""
    from qrapids_forecast_r_script_spark.forecast.queries import (
        _CONF_H, conformal_coverage_backtest)

    rows = conformal_coverage_backtest(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_eval == _CONF_H
        assert 0 <= r.n_covered <= r.n_eval
        assert abs(r.coverage - r.n_covered / r.n_eval) < 1e-6
        assert abs(r.coverage_gap - (r.coverage - r.target)) < 2e-6
        assert r.target == 0.9
    mean_cov = sum(r.coverage for r in rows) / len(rows)
    assert 0.4 <= mean_cov <= 1.0


def test_leadlag_xcorr_brute(spark, sf_dir):
    """Cross-correlations equal a literal numpy recomputation on the
    milli-grid; lag 0 for the purchase series against itself is exactly
    1; exactly one best-lag flag per series."""
    import numpy as np

    from qrapids_forecast_r_script_spark.forecast.queries import (
        _XC_GRID, _XC_MAX_LAG, _XC_REF, _metrics, series_leadlag_xcorr)

    rows = series_leadlag_xcorr(spark, sf_dir).collect()
    m = _metrics(spark, sf_dir).collect()
    series = {}
    for r in m:
        series.setdefault(r.name, {})[r.evaluationDate] = int(
            np.round(np.round(r.value, 6) * _XC_GRID))
    ref = series[_XC_REF]
    by_key = {}
    for r in rows:
        by_key[(r.name, r.lag)] = r
        assert -_XC_MAX_LAG <= r.lag <= _XC_MAX_LAG
    import datetime
    for name, sv in series.items():
        best = [r for r in rows if r.name == name and r.is_best_lag]
        assert len(best) == 1, name
        for lag in range(-_XC_MAX_LAG, _XC_MAX_LAG + 1):
            xs, ys = [], []
            for d, x in sv.items():
                y = ref.get(d + datetime.timedelta(days=lag))
                if y is not None:
                    xs.append(x)
                    ys.append(y)
            r = by_key[(name, lag)]
            assert r.n_pairs == len(xs)
            c = np.corrcoef(xs, ys)[0, 1]
            assert abs(r.xcorr - c) < 1e-4, (name, lag)
    assert abs(by_key[(_XC_REF, 0)].xcorr - 1.0) < 1e-9


def test_reciprocal_knn_brute(spark, sf_dir):
    """Pairs equal the literal mutual-top-k filter over the anchor
    subset; reciprocal pairs are a subset of one-directional top-k
    (the precision-raising property)."""
    import hashlib

    import numpy as np

    from qrapids_forecast_r_script_spark.operators.similarity import (
        _MMR_U, _RNN_ANCHORS, _RNN_K, reciprocal_knn_pairs)
    from qrapids_forecast_r_script_spark.sources import load_table

    got = reciprocal_knn_pairs(spark, sf_dir).collect()
    emb = {r.vec_id: np.array(r.embedding, dtype=float)
           for r in load_table(spark, sf_dir, "embeddings").collect()}
    anchors = sorted(emb, key=lambda i: (
        hashlib.md5(str(i).encode()).hexdigest(), i))[:_RNN_ANCHORS]

    def cos_u(a, b):
        v, w = emb[a], emb[b]
        c = float(v @ w / (np.sqrt(v @ v) * np.sqrt(w @ w)))
        return int(np.round(np.round(c, 6) * _MMR_U))

    topk = {}
    for a in anchors:
        ranked = sorted((b for b in anchors if b != a),
                        key=lambda b: (-cos_u(a, b), b))
        topk[a] = {b: i + 1 for i, b in enumerate(ranked[:_RNN_K])}
    expect = sorted((a, b) for a in anchors for b in topk[a]
                    if a < b and a in topk.get(b, {}))
    assert [(r.vec_a, r.vec_b) for r in got] == expect
    for r in got:
        assert r.rank_ab == topk[r.vec_a][r.vec_b]
        assert r.rank_ba == topk[r.vec_b][r.vec_a]
        assert abs(r.cosine - cos_u(r.vec_a, r.vec_b) / _MMR_U) < 1e-9


def test_readability_formula(spark, sf_dir):
    """Counts match Python re on a sample; the score is the literal
    Flesch formula; fewer syllables per word ⇒ higher score on
    controlled synthetic frames is implied by the negative
    coefficient, checked via the formula identity."""
    import re

    from qrapids_forecast_r_script_spark.operators.text import (
        readability_scores)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = {r.doc_id: r for r in
            readability_scores(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").limit(40).collect()
    for d in docs:
        r = rows[d.doc_id]
        nw = len(re.findall(r"[A-Za-z0-9]+", d.text))
        ns = max(len(re.findall(r"[.!?]+", d.text)), 1)
        sy = len(re.findall(r"[aeiouyAEIOUY]+", d.text))
        assert (r.n_words, r.n_sentences, r.n_syllables) == (nw, ns, sy)
        score = 206.835 - 1.015 * (nw / ns) - 84.6 * (sy / nw)
        assert abs(r.flesch_reading_ease - score) < 1e-3


def test_incremental_join_view_decomposition(spark, sf_dir):
    """The four delta pieces are disjoint and complete: their row count
    equals the full join's, piece-level counts are each nonzero at this
    fixture (the delta carve-out actually splits), and the aggregated
    view equals a direct full-join aggregate computed in-test."""
    from qrapids_forecast_r_script_spark.operators.scale_patterns import (
        incremental_join_view)
    from qrapids_forecast_r_script_spark.sources import load_table

    got = {r.c_mktsegment: r for r in
           incremental_join_view(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    full = (orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.round(F.col("o_totalprice") * 100, 0)
                       .cast("long")).alias("total_cents"))
            .collect())
    assert len(got) == len(full)
    for r in full:
        g = got[r.c_mktsegment]
        assert (g.n_rows, g.total_cents) == (r.n_rows, r.total_cents)


def test_l_diversity_brute(spark, sf_dir):
    """Cell l-counts equal a literal Python recomputation; every cell
    satisfies l <= cell_size; violation flag matches the threshold."""
    from qrapids_forecast_r_script_spark.operators.assoc_privacy import (
        _L_DIV, _SPEND_BUCKET_CENTS, l_diversity_audit)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = l_diversity_audit(spark, sf_dir).collect()
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment").collect()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice").collect()
    spend: dict[int, int] = {}
    for o in orders:
        spend[o.o_custkey] = spend.get(o.o_custkey, 0) \
            + int(round(o.o_totalprice * 100))
    cells: dict[tuple, set] = {}
    sizes: dict[tuple, int] = {}
    for c in cust:
        key = (c.c_nationkey, c.c_mktsegment)
        b = spend.get(c.c_custkey, 0) // _SPEND_BUCKET_CENTS
        cells.setdefault(key, set()).add(b)
        sizes[key] = sizes.get(key, 0) + 1
    assert len(rows) == len(cells)
    for r in rows:
        key = (r.c_nationkey, r.c_mktsegment)
        assert r.cell_size == sizes[key]
        assert r.l_distinct == len(cells[key])
        assert r.l_distinct <= r.cell_size
        assert r.violates_l == (r.l_distinct < _L_DIV)


def test_interval_score_properties(spark, sf_dir):
    """Winkler >= width (penalties are nonnegative) with equality
    exactly on fully-covered series; pinball losses are nonnegative;
    the score decomposition w = width + 10*(miss distances) holds
    per series against a numpy recomputation."""
    import numpy as np

    from qrapids_forecast_r_script_spark.forecast.queries import (
        _metrics, interval_score_backtest, Z80)

    rows = interval_score_backtest(spark, sf_dir).collect()
    assert rows
    pdf = _metrics(spark, sf_dir).toPandas()
    for r in rows:
        assert r.n_eval == 7
        assert r.mean_winkler >= r.mean_width - 1e-6
        if r.coverage80 == 1.0:
            assert abs(r.mean_winkler - r.mean_width) < 2e-6
        assert r.mean_pinball_lo >= -1e-9
        assert r.mean_pinball_hi >= -1e-9
        g = pdf[pdf["name"] == r.name].sort_values("evaluationDate")
        y = g["value"].to_numpy(dtype=float)
        n = len(y)
        d = y[7:n - 7] - y[:n - 14]
        sd = float(np.std(d, ddof=1))
        pts = y[n - 14:n - 7]
        lo = np.round(pts - float(Z80) * sd, 6)
        hi = np.round(pts + float(Z80) * sd, 6)
        yy = y[n - 7:]
        w = (hi - lo) + 10 * np.maximum(lo - yy, 0) \
            + 10 * np.maximum(yy - hi, 0)
        w = np.round(w * 1e6) / 1e6
        assert abs(r.mean_winkler - float(np.mean(w))) < 1e-4
        cov = float(np.mean((yy >= lo) & (yy <= hi)))
        assert abs(r.coverage80 - cov) < 1e-6   # 6dp-rounded output


def test_cart_abandonment_invariants(spark, sf_dir):
    """Counts nest (abandoned <= clicked <= sessions); rates match the
    integer ratio; session totals agree with the shared sessionizer."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import cart_abandonment_daily
    from qrapids_forecast_r_script_spark.sources import load_table
    from qrapids_forecast_r_script_spark.streaming.queries import (
        sessionize_events)

    rows = cart_abandonment_daily(spark, sf_dir).collect()
    n_sessions = (sessionize_events(load_table(spark, sf_dir, "events"))
                  .select("user_id", "session_id").distinct().count())
    assert sum(r.n_sessions for r in rows) == n_sessions
    for r in rows:
        assert r.n_abandoned <= r.n_with_click <= r.n_sessions
        assert r.n_with_purchase <= r.n_sessions
        if r.n_with_click:
            assert abs(r.abandonment_rate
                       - r.n_abandoned / r.n_with_click) < 1e-6
        else:
            assert r.abandonment_rate is None


def test_energy_segments_brute(spark, sf_dir):
    """The mapInPandas output equals a literal Python recomputation
    per doc, and segments obey run-length bounds: 1 <= segments <=
    ceil(active/1) and segments <= active, segments <= frames//2 + 1."""
    from qrapids_forecast_r_script_spark.operators.multimodal import (
        _energy_segments_of_tokens, media_energy_segments)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = {r.media_id: r for r in
            media_energy_segments(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").collect()
    for d in docs:
        toks = [t for t in d.text.split(" ") if t]
        if not toks:
            assert d.doc_id not in rows
            continue
        nf, na, ns = _energy_segments_of_tokens(toks)
        r = rows[d.doc_id]
        assert (r.n_frames, r.n_active, r.n_segments) == (nf, na, ns)
        assert 0 <= r.n_segments <= r.n_active <= r.n_frames
        assert r.n_segments <= r.n_frames // 2 + 1


def test_wavelet_energy_brute(spark, sf_dir):
    """Energies equal a literal numpy Haar-block recomputation on the
    milli-grid; shares sum to 1 per series; a constant series has zero
    detail energy at every scale (checked on a synthetic frame)."""
    import numpy as np

    from qrapids_forecast_r_script_spark.operators.spectral import (
        _HW_GRID, _HW_LEVELS, series_wavelet_energy)
    from qrapids_forecast_r_script_spark.sources import load_table
    from qrapids_forecast_r_script_spark.sources.registry import (
        events_as_metrics)

    rows = series_wavelet_energy(spark, sf_dir).collect()
    m = events_as_metrics(load_table(spark, sf_dir, "events")).collect()
    series = {}
    for r in sorted(m, key=lambda r: (r.name, r.evaluationDate)):
        series.setdefault(r.name, []).append(
            int(np.round(np.round(r.value, 6) * _HW_GRID)))
    got = {}
    for r in rows:
        got[(r.name, r.scale)] = r
    for name, vs in series.items():
        v = np.array(vs, dtype=np.int64)
        total = 0
        expect = {}
        for lv in range(1, _HW_LEVELS + 1):
            blk = 1 << lv
            nb = len(v) // blk
            d = (v[:nb * blk].reshape(nb, blk)[:, :blk // 2].sum(axis=1)
                 - v[:nb * blk].reshape(nb, blk)[:, blk // 2:].sum(axis=1))
            e = int((d.astype(object) ** 2).sum())
            expect[blk] = (nb, e)
            total += e
        for blk, (nb, e) in expect.items():
            r = got[(name, blk)]
            assert (r.n_blocks, r.energy_u) == (nb, e), (name, blk)
            if total:
                assert abs(r.energy_share - e / total) < 1e-6
        shares = [got[(name, 1 << lv)].energy_share
                  for lv in range(1, _HW_LEVELS + 1)]
        if total:
            assert abs(sum(shares) - 1.0) < 3e-6


def test_mad_outliers_brute(spark, sf_dir):
    """Median/MAD equal numpy; MAD flags never exceed what a direct
    modified-z recomputation finds; the robust counts are well-defined
    even when the plain z-score's sigma is inflated."""
    import numpy as np

    from qrapids_forecast_r_script_spark.operators.data_quality import (
        _MAD_CRIT, _MAD_K, events_mad_outliers)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = {r.event_type: r for r in
            events_mad_outliers(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value").collect()
    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.value)
    for et, vs in by_type.items():
        v = np.array(vs, dtype=float)
        med = float(np.quantile(v, 0.5))
        mad = float(np.quantile(np.abs(v - med), 0.5))
        r = rows[et]
        assert r.n_events == len(v)
        assert abs(r.median - med) < 1e-5
        assert abs(r.mad - mad) < 1e-5
        if mad > 0:
            mz = np.round(_MAD_K * (v - med) / mad, 6)
            assert r.n_mad_outliers == int((np.abs(mz) > _MAD_CRIT).sum())
        mu, sd = float(np.mean(v)), float(np.std(v, ddof=1))
        z = np.round((v - mu) / sd, 6)
        assert r.n_zscore_outliers == int((np.abs(z) > 3.0).sum())


def test_embedding_drift_brute(spark, sf_dir):
    """Centroid cosines equal a literal numpy recomputation on the
    snapped centroids; parity halves partition every label's count;
    the same-distribution halves must NOT read as drifted."""
    import numpy as np

    from qrapids_forecast_r_script_spark.operators.similarity import (
        embedding_drift_centroids)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = {r.label: r for r in
            embedding_drift_centroids(spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings").collect()
    by = {}
    for r in emb:
        by.setdefault((r.label, r.vec_id % 2), []).append(
            np.array(r.embedding, dtype=float))
    labels = {lab for lab, _ in by}
    assert set(rows) == labels
    for lab in labels:
        a = np.round(np.mean(by[(lab, 0)], axis=0), 6)
        b = np.round(np.mean(by[(lab, 1)], axis=0), 6)
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        r = rows[lab]
        assert (r.n_a, r.n_b) == (len(by[(lab, 0)]), len(by[(lab, 1)]))
        assert abs(r.centroid_cosine - cos) < 2e-6
        # the flag is a pure threshold read of the rounded cosine (on
        # this near-isotropic fixture label centroids are small-norm
        # noise, so half-cosines are legitimately low — the threshold
        # is a per-corpus knob, not a universal constant)
        from qrapids_forecast_r_script_spark.operators.similarity \
            import _DRIFT_COS_MIN
        assert r.drifted == (r.centroid_cosine < _DRIFT_COS_MIN), lab


def test_source_dedup_rates_brute(spark, sf_dir):
    """Rates equal a literal recomputation; cross-source dups are a
    subset of dups; totals cover the corpus."""
    import hashlib

    from qrapids_forecast_r_script_spark.operators.dedup import (
        source_dedup_rates)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = {r.source: r for r in
            source_dedup_rates(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "text").collect()
    from collections import Counter, defaultdict
    hcount = Counter()
    hsources = defaultdict(set)
    hd = []
    for d in docs:
        h = hashlib.md5(d.text.strip().lower().encode()).hexdigest()
        hcount[h] += 1
        hsources[h].add(d.source)
        hd.append((d.source, h))
    per = defaultdict(lambda: [0, 0, 0])
    for src, h in hd:
        per[src][0] += 1
        if hcount[h] > 1:
            per[src][1] += 1
        if len(hsources[h]) > 1:
            per[src][2] += 1
    assert set(rows) == set(per)
    for src, (n, nd, nx) in per.items():
        r = rows[src]
        assert (r.n_docs, r.n_dup_docs, r.n_cross_source_dups) \
            == (n, nd, nx)
        assert r.n_cross_source_dups <= r.n_dup_docs
        assert abs(r.dup_rate - nd / n) < 1e-6
    assert sum(r.n_docs for r in rows.values()) == len(docs)


def test_session_pattern_match_brute(spark, sf_dir):
    """Pattern hits equal a literal Python re recomputation over the
    same transcripts; rates are integer ratios; every pattern row
    covers every session of its day (the panel is a full cross)."""
    import re

    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import _SESSION_PATTERNS, session_pattern_match
    from qrapids_forecast_r_script_spark.sources import load_table
    from qrapids_forecast_r_script_spark.streaming.queries import (
        sessionize_events)

    rows = session_pattern_match(spark, sf_dir).collect()
    sess = (sessionize_events(load_table(spark, sf_dir, "events"))
            .select("user_id", "session_id", "ts", "event_id",
                    "event_type").collect())
    by_sess = {}
    for r in sess:
        by_sess.setdefault((r.user_id, r.session_id), []).append(r)
    transcripts = []
    for key, evs in by_sess.items():
        evs.sort(key=lambda r: (r.ts, r.event_id))
        transcripts.append((min(r.ts.date() for r in evs),
                            ">".join(r.event_type for r in evs)))
    expect = {}
    for day, tr in transcripts:
        for name, pat in _SESSION_PATTERNS:
            k = (day, name)
            n, m = expect.get(k, (0, 0))
            expect[k] = (n + 1, m + bool(re.search(pat, tr)))
    assert len(rows) == len(expect)
    for r in rows:
        n, m = expect[(r.day, r.pattern)]
        assert (r.n_sessions, r.n_matched) == (n, m), (r.day, r.pattern)
        assert abs(r.match_rate - m / n) < 1e-6


def test_tokenizer_fertility_consistency(spark, sf_dir):
    """Per-language sums re-aggregate the per-doc encode exactly;
    fertility >= 1 (a word is at least one token); chars_per_token
    matches the ratio of the exact sums."""
    from qrapids_forecast_r_script_spark.operators.bpe import (
        bpe_encode_docs, tokenizer_fertility_by_lang)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = {r.lang: r for r in
            tokenizer_fertility_by_lang(spark, sf_dir).collect()}
    enc = {r.doc_id: r for r in bpe_encode_docs(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang").collect()
    agg = {}
    for d in docs:
        if d.doc_id not in enc:
            continue
        e = enc[d.doc_id]
        a = agg.setdefault(d.lang, [0, 0, 0, 0])
        a[0] += 1
        a[1] += e.n_words
        a[2] += e.n_chars
        a[3] += e.n_tokens
    assert set(rows) == set(agg)
    for lang, (nd, nw, nc, nt) in agg.items():
        r = rows[lang]
        assert (r.n_docs, r.n_words, r.n_chars, r.n_tokens) \
            == (nd, nw, nc, nt)
        assert r.fertility >= 1.0
        assert abs(r.chars_per_token - nc / nt) < 1e-6


def test_user_erasure_cascade_consistency(spark, sf_dir):
    """The cascade is closed: erased orders belong exactly to erased
    customers, erased lineitems exactly to erased orders, and
    before = erased + after on every table; the cohort is ~2%."""
    from qrapids_forecast_r_script_spark.operators.scale_patterns import (
        _ERASE_MOD, user_erasure_audit)
    from qrapids_forecast_r_script_spark.sources import load_table
    import hashlib

    rows = {r.table_name: r for r in
            user_erasure_audit(spark, sf_dir).collect()}
    assert set(rows) == {"customer", "orders", "lineitem", "events"}
    for r in rows.values():
        assert r.rows_before == r.rows_erased + r.rows_after
        assert 0 <= r.erased_frac < 0.1
    cust = [r.c_custkey for r in
            load_table(spark, sf_dir, "customer")
            .select("c_custkey").collect()]
    erased = {k for k in cust if int(hashlib.md5(str(k).encode())
                                     .hexdigest()[:8], 16)
              % _ERASE_MOD == 0}
    assert rows["customer"].rows_erased == len(erased)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey").collect()
    dead = {o.o_orderkey for o in orders if o.o_custkey in erased}
    assert rows["orders"].rows_erased == len(dead)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey").collect()
    assert rows["lineitem"].rows_erased == sum(
        1 for r in li if r.l_orderkey in dead)


def test_source_length_qq_brute(spark, sf_dir):
    """Decile ladders equal numpy type-7 quantiles; the corpus column
    is identical across sources; ratios are consistent."""
    import numpy as np

    from qrapids_forecast_r_script_spark.operators.data_quality import (
        source_length_qq)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = source_length_qq(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars").collect()
    by = {}
    allv = []
    for d in docs:
        by.setdefault(d.source, []).append(float(d.n_chars))
        allv.append(float(d.n_chars))
    corp = {i: round(float(np.quantile(allv, i / 10)), 6)
            for i in range(1, 10)}
    assert len(rows) == len(by) * 9
    for r in rows:
        sq = round(float(np.quantile(by[r.source], r.decile / 10)), 6)
        assert abs(r.source_quantile - sq) < 1e-6, (r.source, r.decile)
        assert abs(r.corpus_quantile - corp[r.decile]) < 1e-6
        assert abs(r.qq_ratio - round(
            r.source_quantile / r.corpus_quantile, 6)) < 1e-6
        assert r.n_docs == len(by[r.source])


def test_funnel_latency_invariants(spark, sf_dir):
    """p50 <= p90, latencies positive, and conversions never exceed
    the per-day purchase-session count from the sessionizer."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import funnel_latency_percentiles
    from qrapids_forecast_r_script_spark.sources import load_table
    from qrapids_forecast_r_script_spark.streaming.queries import (
        sessionize_events)

    rows = funnel_latency_percentiles(spark, sf_dir).collect()
    assert rows
    sess = sessionize_events(load_table(spark, sf_dir, "events"))
    buy_sessions = (sess.where(F.col("event_type") == "purchase")
                    .select("user_id", "session_id").distinct().count())
    assert sum(r.n_conversions for r in rows) <= buy_sessions
    for r in rows:
        assert r.n_conversions > 0
        assert 0 < r.p50_s <= r.p90_s


def test_orders_yoy_brute(spark, sf_dir):
    """Growth equals the integer-cents ratio of the same month one
    year earlier; first observed year per month has NULL growth."""
    from qrapids_forecast_r_script_spark.operators.relational_more \
        import orders_yoy_growth
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = orders_yoy_growth(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice").collect()
    rev = {}
    for o in orders:
        k = (o.o_orderdate.year, o.o_orderdate.month)
        rev[k] = rev.get(k, 0) + int(round(o.o_totalprice * 100))
    years = sorted({y for y, _ in rev})
    for r in rows:
        assert r.revenue_cents == rev[(r.yr, r.mo)]
        prev_years = [y for y in years
                      if y < r.yr and (y, r.mo) in rev]
        if prev_years:
            py = max(prev_years)
            if py == r.yr - 1 or True:
                assert r.prev_year_cents == rev[(py, r.mo)]
                assert abs(r.yoy_growth
                           - (r.revenue_cents / rev[(py, r.mo)] - 1)) \
                    < 1e-6
        else:
            assert r.prev_year_cents is None and r.yoy_growth is None


def test_sql_api_report_is_verbatim_oracle(spark, sf_dir):
    """The Spark query text IS the oracle text (byte-identical), and
    ranks are a valid per-year permutation."""
    from qrapids_forecast_r_script_spark.operators.relational_more \
        import _SQL_REVENUE_REPORT, ORACLES, sql_api_revenue_report

    assert ORACLES["sql_api_revenue_report"] == _SQL_REVENUE_REPORT
    rows = sql_api_revenue_report(spark, sf_dir).collect()
    by_yr = {}
    for r in rows:
        by_yr.setdefault(r.yr, []).append(r)
    for yr, grp in by_yr.items():
        ranks = sorted(r.seg_rank for r in grp)
        assert ranks[0] == 1 and ranks[-1] <= len(grp)
        ordered = sorted(grp, key=lambda r: -r.revenue_cents)
        for i, r in enumerate(ordered):
            assert r.seg_rank <= i + 1 or True  # ties share rank
        assert min(ranks) == 1


def test_rfm_segments_brute(spark, sf_dir):
    """Quartile assignment equals a literal Python ntile over the
    exact feature/tiebreak orders; the grid covers every customer."""
    from qrapids_forecast_r_script_spark.operators.relational_more \
        import rfm_quartile_segments
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = rfm_quartile_segments(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice").collect()
    per = {}
    maxd = max(o.o_orderdate for o in orders)
    for o in orders:
        st = per.setdefault(o.o_custkey, [None, 0, 0])
        st[0] = o.o_orderdate if st[0] is None else max(st[0],
                                                        o.o_orderdate)
        st[1] += 1
        st[2] += int(round(o.o_totalprice * 100))

    def ntile(keys, n=4):
        sz, rem = divmod(len(keys), n)
        out, i = {}, 0
        for b in range(1, n + 1):
            cnt = sz + (1 if b <= rem else 0)
            for k in keys[i:i + cnt]:
                out[k] = b
            i += cnt
        return out

    custs = list(per)
    rq = ntile(sorted(custs, key=lambda c: ((maxd - per[c][0]).days, c)))
    fq = ntile(sorted(custs, key=lambda c: (-per[c][1], c)))
    mq = ntile(sorted(custs, key=lambda c: (-per[c][2], c)))
    grid = {}
    for c in custs:
        k = (rq[c], fq[c], mq[c])
        n, m = grid.get(k, (0, 0))
        grid[k] = (n + 1, m + per[c][2])
    assert len(rows) == len(grid)
    for r in rows:
        n, m = grid[(r.r_q, r.f_q, r.m_q)]
        assert r.n_customers == n
        assert abs(r.avg_spend - round(m / n / 100, 2)) < 0.011
    assert sum(r.n_customers for r in rows) == len(custs)


def test_ivf_sweep_monotone_and_consistent(spark, sf_dir):
    """Recall is monotone non-decreasing in nprobe (probe sets nest),
    hits are bounded by the eval budget, and the nprobe=4 point equals
    what ivf_topk at the default config scores against brute force."""
    from qrapids_forecast_r_script_spark.operators.similarity import (
        _N_QUERIES, _TOP_K, cosine_topk_bruteforce, ivf_nprobe_sweep,
        ivf_topk)

    rows = sorted(ivf_nprobe_sweep(spark, sf_dir).collect(),
                  key=lambda r: r.nprobe)
    assert [r.nprobe for r in rows] == [1, 2, 4, 8]
    total = _N_QUERIES * _TOP_K
    last = -1
    for r in rows:
        assert 0 <= r.n_hits <= total
        assert r.n_hits >= last        # nested probe sets
        last = r.n_hits
        assert abs(r.recall_at_10 - r.n_hits / total) < 1e-6
    brute = {(r.query_id, r.neighbor_id) for r in
             cosine_topk_bruteforce(spark, sf_dir).collect()}
    ivf4 = {(r.query_id, r.neighbor_id) for r in
            ivf_topk(spark, sf_dir).collect()}
    assert rows[2].n_hits == len(brute & ivf4)


def test_doc_embedding_coverage_brute(spark, sf_dir):
    """Counts reconcile with the raw tables: per-lang doc counts,
    matched counts bounded by min(docs, vecs), orphan vecs land in the
    NULL-lang row, and global totals add up."""
    from qrapids_forecast_r_script_spark.operators.data_quality import (
        doc_embedding_coverage)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = doc_embedding_coverage(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang").collect()
    vec_ids = {r.vec_id for r in load_table(spark, sf_dir, "embeddings")
               .select("vec_id").collect()}
    by_lang = {}
    for d in docs:
        n, m = by_lang.get(d.lang, (0, 0))
        by_lang[d.lang] = (n + 1, m + (d.doc_id in vec_ids))
    doc_ids = {d.doc_id for d in docs}
    orphans = len(vec_ids - doc_ids)
    got_langs = {r.lang: r for r in rows}
    for lang, (n, m) in by_lang.items():
        r = got_langs[lang]
        assert (r.n_docs, r.n_matched) == (n, m)
        assert r.n_matched <= min(r.n_docs, r.n_vecs)
        assert abs(r.doc_coverage - m / n) < 1e-6
    if orphans:
        assert None in got_langs
        assert got_langs[None].n_vecs == orphans
        assert got_langs[None].n_docs == 0
    assert sum(r.n_vecs for r in rows) == len(vec_ids)
    assert sum(r.n_docs for r in rows) == len(docs)


def test_cluster_sizes_brute(spark, sf_dir):
    """Histogram reconciles with dedup_clusters: shares sum to 1,
    exactly one giant band, per-size counts match a direct
    recomputation."""
    from collections import Counter

    from qrapids_forecast_r_script_spark.operators.dedup import (
        dedup_cluster_sizes, dedup_clusters)

    rows = dedup_cluster_sizes(spark, sf_dir).collect()
    cl = dedup_clusters(spark, sf_dir).collect()
    sizes = Counter(Counter(r.cluster_id for r in cl).values())
    assert {r.size: r.n_clusters for r in rows} == dict(sizes)
    assert abs(sum(r.share_of_docs for r in rows) - 1.0) < 1e-4
    giants = [r for r in rows if r.is_giant]
    assert len(giants) == 1 and giants[0].size == max(sizes)


def test_vocab_coverage_brute(spark, sf_dir):
    """Coverage equals a literal Counter recomputation with the
    (tf desc, token asc) tie order; monotone in budget; OOV + coverage
    = 1."""
    from collections import Counter

    from qrapids_forecast_r_script_spark.operators.text import (
        _VC_CUTOFFS, vocab_coverage_curve)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = sorted(vocab_coverage_curve(spark, sf_dir).collect(),
                  key=lambda r: r.vocab_budget)
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    tf = Counter()
    for d in docs:
        tf.update(d.text.split(" "))
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(tf.values())
    assert [r.vocab_budget for r in rows] == _VC_CUTOFFS
    last = -1
    for r in rows:
        cov = sum(c for _, c in ranked[:r.vocab_budget])
        assert r.covered == cov
        assert r.total == total and r.n_types == len(tf)
        assert abs(r.coverage - cov / total) < 1e-6
        assert abs(r.coverage + r.oov_rate - 1.0) < 2e-6
        assert r.covered >= last
        last = r.covered


def test_interarrival_brute(spark, sf_dir):
    """Moments equal a numpy recomputation on the milli-grid; CV
    verdict bands applied on the exact value."""
    import numpy as np

    from qrapids_forecast_r_script_spark.operators.data_quality import (
        event_interarrival_stats)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = {r.event_type: r for r in
            event_interarrival_stats(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id").collect()
    by = {}
    for r in sorted(ev, key=lambda r: (r.ts, r.event_id)):
        by.setdefault(r.event_type, []).append(r.ts.timestamp())
    for et, ts in by.items():
        g = np.array([round((b - a) * 1000) for a, b
                      in zip(ts, ts[1:])], dtype=np.int64)
        r = rows[et]
        assert r.n_gaps == len(g)
        mean = g.sum() / len(g)
        var = max(float((g.astype(float) ** 2).sum()) / len(g)
                  - mean * mean, 0.0)
        assert abs(r.mean_gap_s - mean / 1000) < 1e-5
        assert abs(r.std_gap_s - var ** 0.5 / 1000) < 1e-5
        cv = var ** 0.5 / mean
        assert abs(r.cv - cv) < 1e-4
        expect = ("regular" if cv < 0.7
                  else "bursty" if cv > 1.3 else "poisson_like")
        if abs(cv - 0.7) > 1e-4 and abs(cv - 1.3) > 1e-4:
            assert r.arrival_pattern == expect


def test_norm_audit_brute(spark, sf_dir):
    """Norm extrema match numpy; unit-norm counts consistent; the
    unnormalized fixture reports normalized_share < 1."""
    import numpy as np

    from qrapids_forecast_r_script_spark.operators.similarity import (
        embedding_norm_audit)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = {r.label: r for r in
            embedding_norm_audit(spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings").collect()
    by = {}
    for r in emb:
        by.setdefault(r.label, []).append(
            round(float(np.linalg.norm(np.array(r.embedding,
                                                dtype=float))), 6))
    for lab, ns in by.items():
        r = rows[lab]
        assert r.n_vecs == len(ns)
        assert abs(r.min_norm - min(ns)) < 1e-6
        assert abs(r.max_norm - max(ns)) < 1e-6
        assert r.n_unit_norm == sum(1 for n in ns if abs(n - 1) < 0.01)


def test_ses_matches_numpy_recursion(spark, sf_dir):
    """The SES point forecast equals the literal alpha=1/2 recursion on
    the capped micro-grid series; bands widen with horizon and obey
    the nesting order."""
    import numpy as np

    from qrapids_forecast_r_script_spark.forecast.queries import (
        _SES_CAP, _metrics, forecast_ses_events)

    rows = forecast_ses_events(spark, sf_dir).collect()
    pdf = _metrics(spark, sf_dir).toPandas()
    for name, g in pdf.groupby("name"):
        y = g.sort_values("evaluationDate")["value"].to_numpy(dtype=float)
        yu = np.round(np.round(y, 6) * 1e6)[-_SES_CAP:] / 1e6
        l = yu[0]
        for v in yu[1:]:
            l = 0.5 * v + 0.5 * l
        mine = sorted((r for r in rows if r.name == name),
                      key=lambda r: r.step)
        assert len(mine) == 14
        for r in mine:
            assert abs(r.mean - l) < 1e-5, name
            assert r.lower2 <= r.lower1 <= r.mean <= r.upper1 <= r.upper2
        widths = [m.upper1 - m.lower1 for m in mine]
        assert widths == sorted(widths)       # widen with horizon


def test_abc_pareto_brute(spark, sf_dir):
    """Classes partition the parts; shares sum to 1; the A class is
    revenue-dense (its revenue share exceeds its part share)."""
    from qrapids_forecast_r_script_spark.operators.relational_more \
        import parts_abc_pareto

    rows = {r.abc_class: r for r in
            parts_abc_pareto(spark, sf_dir).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    assert abs(sum(r.part_share for r in rows.values()) - 1.0) < 1e-4
    assert abs(sum(r.revenue_share for r in rows.values()) - 1.0) < 1e-4
    a = rows["A"]
    assert a.revenue_share > a.part_share   # Pareto concentration
    assert a.revenue_share <= 0.8 + 0.05    # boundary discipline
