"""Property tests for the late-round curation/graph/stats additions
(entity_components, order_price_mad_by_priority, doc_chunks); the oracle
harness covers their DuckDB twins."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_entity_components_are_valid_partition():
    from ner_funtool_ray.pipelines.graph import entity_components

    df = entity_components(SF).to_pandas()
    # the label is the lexicographic min of the component, so label <= member
    assert (df["component"] <= df["entity_id"]).all()
    # labels are closed: a component representative labels itself
    reps = set(df["component"])
    own = df.set_index("entity_id")["component"]
    for r in reps:
        assert own[r] == r


def test_entity_components_respect_edges():
    """Every co-occurrence edge joins two entities with the same label
    (the graph's diameter fits the default rounds at this scale)."""
    from ner_funtool_ray.pipelines.graph import entity_components
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    lab = (
        entity_components(SF)
        .to_pandas()
        .set_index("entity_id")["component"]
    )
    tr = kg_from_sf_dir(SF).to_pandas()
    cooc = tr[tr["pred"] == "cooccurs_with"]
    assert (cooc["subj"].map(lab).to_numpy() == cooc["obj"].map(lab).to_numpy()).all()


def test_mad_matches_bruteforce():
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.stats import order_price_mad_by_priority

    got = order_price_mad_by_priority(SF).to_pandas()
    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).to_pandas()
    t["cents"] = np.round(t["o_totalprice"] * 100).astype(np.int64)

    def lower_median(v: np.ndarray) -> int:
        s = np.sort(v)
        return int(s[(len(s) + 1) // 2 - 1])

    for _, row in got.iterrows():
        v = t.loc[t["o_orderpriority"] == row["o_orderpriority"], "cents"]
        med = lower_median(v.to_numpy())
        assert row["median_cents"] == med
        assert row["mad_cents"] == lower_median(np.abs(v.to_numpy() - med))


def test_doc_chunks_reconstruct_documents():
    """Stride-aligned prefixes of consecutive chunks re-concatenate to the
    original token stream (overlap = width - stride is dropped)."""
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.curation import doc_chunks

    width, stride = 32, 24
    ch = doc_chunks(SF, width=width, stride=stride).to_pandas()
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    sample = docs.head(20)
    by_doc = {d: g.sort_values("chunk_id") for d, g in ch.groupby("doc_id")}
    for _, row in sample.iterrows():
        toks = row["text"].split(" ")
        g = by_doc[row["doc_id"]]
        assert len(g) == (len(toks) + stride - 1) // stride
        rebuilt = []
        for _, c in g.iterrows():
            rebuilt.extend(c["chunk_text"].split(" ")[:stride])
        assert rebuilt == toks
        assert (g["n_tokens"] <= width).all()


def test_doc_chunks_polars_and_python_paths_agree():
    from ner_funtool_ray.pipelines import curation as C

    got = C.doc_chunks(SF).to_pandas()

    # force the pure-python fallback by running the inner kernel directly
    import pyarrow.parquet as pq

    batch = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids, cids, texts, lens = [], [], [], []
    for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        toks = text.split(" ")
        for ci, start in enumerate(range(0, len(toks), 24)):
            window = toks[start : start + 32]
            ids.append(did)
            cids.append(ci)
            texts.append(" ".join(window))
            lens.append(len(window))
    exp = pd.DataFrame(
        {"doc_id": ids, "chunk_id": cids, "chunk_text": texts, "n_tokens": lens}
    )
    key = ["doc_id", "chunk_id"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_ngram_containment_bruteforce():
    """Containment pairs at t=0.8 equal the brute-force all-pairs answer
    (recall 1.0 — no blocking loss)."""
    import pyarrow.parquet as pq

    from ner_funtool_ray.sources.io import read_parquet_auto
    from ner_funtool_ray.stages.dedup import ngram_jaccard_pairs

    ds = read_parquet_auto(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = (
        ngram_jaccard_pairs(ds, threshold=0.8, metric="containment")
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()

    def shingles(text):
        toks = [t for t in text.split() if t]
        if len(toks) >= 2:
            return set(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        return set(toks)

    sh = {r.doc_id: shingles(r.text) for r in docs.itertuples()}
    ids = sorted(sh)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and min(len(sh[a]), len(sh[b])):
                c = inter / min(len(sh[a]), len(sh[b]))
                if c >= 0.8:
                    rows.append((a, b, c))
    assert [tuple(r) for r in got.itertuples(index=False)] == rows


def test_mixture_sample_rates_honored():
    """The per-language survival rate matches the md5 rule exactly."""
    import pyarrow.parquet as pq

    from ner_funtool_ray.functions.md5vec import md5_number_lower_batch
    from ner_funtool_ray.pipelines.curation import (
        _MIXTURE_DEFAULT,
        _MIXTURE_RATES,
        mixture_sample,
    )

    got = set(mixture_sample(SF).to_pandas()["doc_id"])
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"]).to_pandas()
    rates = dict(_MIXTURE_RATES)
    u = md5_number_lower_batch([str(d) for d in docs["doc_id"]])
    expect = {
        int(d)
        for d, h, l in zip(docs["doc_id"], u, docs["lang"])
        if int(h) % 1000 < rates.get(l, _MIXTURE_DEFAULT)
    }
    assert got == expect
    # 'en' (rate 1000) survives completely
    en = set(docs.loc[docs["lang"] == "en", "doc_id"])
    assert en <= got


def test_monthly_revenue_delta_invariants():
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.mining import monthly_revenue_delta

    df = monthly_revenue_delta(SF).to_pandas()
    # dense month grid, deltas telescope back to each month's revenue
    assert (np.diff(df["month"]) == 1).all()
    assert (df["delta_cents"].cumsum() == df["rev_cents"]).all()
    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_totalprice"])
    total = int(np.round(np.asarray(orders["o_totalprice"]) * 100).sum())
    assert int(df["rev_cents"].sum()) == total


def test_embedding_quantize_roundtrip_error_bound():
    """Dequantized values are within one quantization step of the
    original (|x - q·scale/127| < scale/127), and q fits int8."""
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.embedding import embedding_quantize

    q = embedding_quantize(SF).to_pandas()
    assert q["q"].between(-127, 127).all()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in emb.itertuples()}
    sample = q[q["vec_id"].isin(list(vecs)[:10])]
    for r in sample.itertuples():
        x = vecs[int(r.vec_id)][int(r.i)]
        step = r.scale / 127.0
        assert abs(x - r.q * step) < step + 1e-12


def test_doc_stats_long_is_exact_melt():
    from ner_funtool_ray.pipelines.textops import doc_stats, doc_stats_long

    wide = doc_stats(SF).to_pandas()
    long = doc_stats_long(SF).to_pandas()
    assert len(long) == len(wide) * 5
    piv = long.pivot(index="doc_id", columns="metric", values="value")
    for c in ["n_chars", "n_tokens", "punct_ratio", "stopword_ratio",
              "mean_token_len"]:
        assert np.array_equal(
            piv[c].sort_index().to_numpy(),
            wide.set_index("doc_id")[c].sort_index().to_numpy().astype(float),
        )


def test_tfngram_cosine_bruteforce():
    """TF-weighted cosine pairs at t=0.8 equal the brute-force all-pairs
    answer (recall 1.0; exact integer dot/norms)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from ner_funtool_ray.sources.io import read_parquet_auto
    from ner_funtool_ray.stages.dedup import tfngram_cosine_pairs

    ds = read_parquet_auto(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = (
        tfngram_cosine_pairs(ds, threshold=0.8)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()

    def grams(text):
        toks = [t for t in text.split() if t]
        if len(toks) >= 2:
            return Counter(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        return Counter(toks)

    g = {r.doc_id: grams(r.text) for r in docs.itertuples()}
    n2 = {d: sum(v * v for v in c.values()) for d, c in g.items()}
    ids = sorted(g)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            dot = sum(g[a][s] * g[b][s] for s in g[a].keys() & g[b].keys())
            if dot:
                cos = dot / np.sqrt(float(n2[a]) * float(n2[b]))
                if cos >= 0.8:
                    rows.append((a, b, cos))
    assert [tuple(r) for r in got.itertuples(index=False)] == rows


def test_order_share_within_customer_sums_to_one():
    """Each customer's shares sum to ~1e6 (floor division loses at most
    n_orders-1 ppm per customer) and every row keeps its exact cents."""
    from ner_funtool_ray.pipelines.analytic import order_share_within_customer

    df = order_share_within_customer(SF).to_pandas()
    g = df.groupby("o_custkey").agg(s=("share_ppm", "sum"), n=("share_ppm", "size"))
    assert ((g["s"] <= 1_000_000) & (g["s"] > 1_000_000 - g["n"])).all()
    import pyarrow.parquet as pq

    orders = pq.read_table(f"{SF}/orders.parquet")
    assert len(df) == orders.num_rows


def test_weighted_median_bruteforce():
    """Quantity-weighted median equals the brute-force cumulative-weight
    answer per return flag."""
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.stats import lineitem_weighted_median_price

    got = lineitem_weighted_median_price(SF).to_pandas()
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    ).to_pandas()
    t["cents"] = np.round(t["l_extendedprice"] * 100).astype(np.int64)
    t["qc"] = np.round(t["l_quantity"] * 100).astype(np.int64)
    for _, row in got.iterrows():
        sub = t[t["l_returnflag"] == row["l_returnflag"]].sort_values("cents")
        cum = sub["qc"].cumsum().to_numpy()
        k = (int(cum[-1]) + 1) // 2
        exp = int(sub["cents"].to_numpy()[np.searchsorted(cum, k)])
        assert row["wmedian_cents"] == exp
        assert row["total_qc"] == int(cum[-1])


def test_shared_entity_pairs_symmetric_and_thresholded():
    from ner_funtool_ray.pipelines.graph import source_shared_entity_pairs
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    df = source_shared_entity_pairs(SF).to_pandas()
    assert (df["a"] < df["b"]).all()
    assert (df["shared"] >= 2).all()
    # brute force over the (bounded) membership layer
    tr = kg_from_sf_dir(SF).to_pandas()
    ap = tr[tr["pred"] == "appears_in"][["subj", "obj"]].drop_duplicates()
    sets = ap.groupby("obj")["subj"].apply(set)
    docs = sorted(sets.index)
    expect = {}
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            n = len(sets[a] & sets[b])
            if n >= 2:
                expect[(a, b)] = n
    got = {(r.a, r.b): int(r.shared) for r in df.itertuples()}
    assert got == expect


def test_weekly_active_users_bruteforce():
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.mining import weekly_active_users

    got = weekly_active_users(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts"]).to_pandas()
    day = (ev["ts"].astype("int64") // (86_400_000_000 * 1000) ).astype("int64")
    # ts is datetime64[us] -> int64 us
    day = (ev["ts"].values.astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    ud = pd.DataFrame({"u": ev["user_id"], "d": day}).drop_duplicates()
    lo, hi = int(ud["d"].min()), int(ud["d"].max())
    for _, row in got.sample(min(20, len(got)), random_state=0).iterrows():
        d = int(row["day"])
        exp = ud[(ud["d"] >= d - 6) & (ud["d"] <= d)]["u"].nunique()
        assert row["wau"] == exp
    assert got["day"].min() == lo and got["day"].max() == hi


def test_kmeans_lloyd_partition_and_dims():
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.embedding import kmeans_lloyd

    df = kmeans_lloyd(SF).to_pandas()
    n_vecs = pq.read_table(f"{SF}/embeddings.parquet").num_rows
    per_cid = df.groupby("cid").agg(dims=("dim", "nunique"), n=("n", "first"))
    assert (per_cid["dims"] == 64).all()
    assert int(per_cid["n"].sum()) == n_vecs
    assert df["cid"].between(0, 7).all()


def test_part_price_qty_slope_bruteforce():
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.stats import part_price_qty_slope

    got = part_price_qty_slope(SF).to_pandas()
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).to_pandas()
    t["x"] = np.round(t["l_quantity"] * 100).astype(np.int64)
    t["y"] = np.round(t["l_extendedprice"] * 100).astype(np.int64)
    for _, row in got.sample(min(25, len(got)), random_state=1).iterrows():
        sub = t[t["l_partkey"] == row["l_partkey"]]
        n = len(sub)
        sx, sy = int(sub["x"].sum()), int(sub["y"].sum())
        sxy = int((sub["x"] * sub["y"]).sum())
        sxx = int((sub["x"] * sub["x"]).sum())
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        assert row["slope_num"] == num and row["slope_den"] == den
        # cross-check against numpy's own least squares fit
        fit = np.polyfit(sub["x"].to_numpy(float), sub["y"].to_numpy(float), 1)
        assert abs(row["slope"] - fit[0]) < 1e-6 * max(1.0, abs(fit[0]))


def test_bigram_collocations_ordered_and_thresholded():
    from ner_funtool_ray.pipelines.analytic import bigram_collocations

    df = bigram_collocations(SF).to_pandas()
    assert len(df) == 20
    assert (df["cab"] >= 30).all()
    # deterministic (lift DESC, bigram) order
    key = list(zip(-df["lift_ppm"], df["bigram"]))
    assert key == sorted(key)


def test_table_profile_matches_pandas():
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.quality import table_profile

    got = table_profile(SF).to_pandas().set_index("column")
    t = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    for c in got.index:
        assert got.loc[c, "n_rows"] == len(t)
        assert got.loc[c, "n_null"] == int(t[c].isna().sum())
        assert got.loc[c, "n_distinct"] == t[c].nunique()


def test_cooccur_conditional_rows_sum_to_one_per_subj():
    from ner_funtool_ray.pipelines.graph import entity_cooccur_conditional

    df = entity_cooccur_conditional(SF).to_pandas()
    g = df.groupby("subj").agg(s=("cond_ppm", "sum"), n=("cond_ppm", "size"))
    # floor division loses < 1 ppm per edge
    assert ((g["s"] <= 1_000_000) & (g["s"] > 1_000_000 - g["n"])).all()


def test_ppr_concentrates_on_seed():
    from ner_funtool_ray.pipelines.graph import entity_pagerank, entity_ppr

    ppr = entity_ppr(SF).to_pandas().set_index("entity_id")["ppr_fp"]
    seed = min(ppr.index)
    # the seed holds the global teleport mass -> it must dominate
    assert ppr[seed] == ppr.max()
    pr = entity_pagerank(SF).to_pandas().set_index("entity_id")["pagerank_fp"]
    assert set(ppr.index) == set(pr.index)


def test_basket_confidence_bounds_and_symmetric_support():
    from ner_funtool_ray.pipelines.mining import basket_pair_confidence

    df = basket_pair_confidence(SF).to_pandas()
    assert df["conf_ppm"].between(1, 1_000_000).all()
    # every rule has its reverse with identical pair support
    fwd = {(r.antecedent, r.consequent): r.support_pair for r in df.itertuples()}
    for (a, b), s in fwd.items():
        assert fwd[(b, a)] == s


def test_source_reports_consistent():
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.textops import (
        source_dedup_report,
        source_lang_diversity,
    )

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    div = source_lang_diversity(SF).to_pandas().set_index("source")
    rep = source_dedup_report(SF).to_pandas().set_index("source")
    by_src = docs.groupby("source").size()
    for src, n in by_src.items():
        assert div.loc[src, "n_docs"] == n
        assert rep.loc[src, "n_docs"] == n
        assert 0 <= div.loc[src, "simpson_ppm"] < 1_000_000
        assert rep.loc[src, "n_distinct"] <= n


def test_event_debounce_bounds():
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.sequence import event_debounce

    df = event_debounce(SF).to_pandas()
    assert (df["n_kept"] <= df["n_events"]).all()
    assert (df["n_kept"] >= 1).all()
    ev = pq.read_table(f"{SF}/events.parquet")
    assert int(df["n_events"].sum()) == ev.num_rows
    # gap=0 keeps strictly-later events; a huge gap keeps one per (u, type)
    wide = event_debounce(SF, gap_minutes=10**9).to_pandas()
    assert (wide["n_kept"] <= df["n_kept"]).all()


def test_mention_contexts_positions_valid():
    import pyarrow.parquet as pq
    import re

    from ner_funtool_ray.pipelines.textops import mention_contexts

    df = mention_contexts(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas().set_index("doc_id")
    sample = df.sample(min(30, len(df)), random_state=0)
    for r in sample.itertuples():
        toks = re.findall(r"\w+", docs.loc[r.doc_id, "text"])
        assert toks[r.pos - 1] == r.entity
        assert r.left_ctx == " ".join(toks[max(0, r.pos - 4) : r.pos - 1])


def test_kg_negative_samples_deterministic_and_in_vocab():
    from ner_funtool_ray.pipelines.graph import kg_negative_samples
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    a = kg_negative_samples(SF).to_pandas()
    b = kg_negative_samples(SF).to_pandas()
    key = ["subj", "obj", "i"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    tr = kg_from_sf_dir(SF).to_pandas()
    vocab = set(tr.loc[tr["pred"] == "appears_in", "subj"])
    assert set(a["neg_obj"]) <= vocab
    cooc = tr[tr["pred"] == "cooccurs_with"]
    assert len(a) == 2 * len(cooc)


def test_incremental_dedup_new_only_flags_cross_half():
    import hashlib
    import re

    import pyarrow.parquet as pq

    from ner_funtool_ray.functions.md5vec import md5_number_lower_batch
    from ner_funtool_ray.pipelines.curation import incremental_dedup_new

    got = incremental_dedup_new(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    half = md5_number_lower_batch([str(d) for d in docs["doc_id"]]) % 2

    def fp(t):
        return hashlib.md5(
            " ".join(sorted(set(re.findall(r"\w+", t)))).encode()
        ).hexdigest()

    docs["fp"] = docs["text"].map(fp)
    hist = set(docs.loc[half == 0, "fp"])
    expect = docs.loc[(half == 1) & docs["fp"].isin(hist), "doc_id"]
    assert set(got["doc_id"]) == set(expect)


def test_bpe_top_pairs_first_merge_property():
    """The top pair IS the frequency-maximal adjacent pair over the
    corpus (brute-force on the raw text)."""
    from collections import Counter
    import re

    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.curation import bpe_top_pairs

    got = bpe_top_pairs(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    c = Counter()
    for t in docs["text"]:
        for w in re.findall(r"\w+", t):
            for a, b in zip(w, w[1:]):
                c[a + b] += 1
    best = sorted(c.items(), key=lambda x: (-x[1], x[0]))[0]
    assert (got.iloc[0]["pair"], got.iloc[0]["cnt"]) == best
    assert len(got) == 20


def test_orders_above_p99_bruteforce():
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.stats import orders_above_p99

    got = orders_above_p99(SF).to_pandas().set_index("o_orderpriority")
    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).to_pandas()
    t["cents"] = np.round(t["o_totalprice"] * 100).astype(np.int64)
    for pr, sub in t.groupby("o_orderpriority"):
        s = np.sort(sub["cents"].to_numpy())
        n = len(s)
        thr = int(s[(99 * n + 99) // 100 - 1])
        assert got.loc[pr, "p99_cents"] == thr
        assert got.loc[pr, "n_above"] == int((sub["cents"] > thr).sum())


def test_neighbor_jaccard_bruteforce():
    from ner_funtool_ray.pipelines.graph import entity_neighbor_jaccard
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    got = entity_neighbor_jaccard(SF).to_pandas()
    tr = kg_from_sf_dir(SF).to_pandas()
    cooc = tr[tr["pred"] == "cooccurs_with"]
    neigh = {}
    for s, o in zip(cooc["subj"], cooc["obj"]):
        neigh.setdefault(s, set()).add(o)
        neigh.setdefault(o, set()).add(s)
    ents = sorted(neigh)
    expect = {}
    for i, a in enumerate(ents):
        for b in ents[i + 1 :]:
            inter = len(neigh[a] & neigh[b])
            if inter:
                expect[(a, b)] = inter
    assert {(r.a, r.b): int(r.inter) for r in got.itertuples()} == expect
    assert (got["jac_ppm"] == got["inter"] * 1_000_000 // got["union_n"]).all()


def test_graph_feature_invariants():
    from ner_funtool_ray.pipelines.graph import (
        entity_clustering_coefficient,
        entity_kcore,
        entity_resource_allocation,
        entity_triangle_counts,
    )

    cc = entity_clustering_coefficient(SF).to_pandas()
    assert cc["cc_ppm"].between(0, 1_000_000).all()
    # triangles agree with the standalone triangle op
    tri = entity_triangle_counts(SF).to_pandas().set_index("entity_id")
    merged = cc.set_index("entity_id").join(tri, rsuffix="_t")
    assert (merged["triangles"] == merged.iloc[:, -1]).all()

    core = entity_kcore(SF).to_pandas()
    # core membership implies degree >= 2 in the original graph
    deg = cc.set_index("entity_id")["degree"]
    in_core = core[core["in_core"] == 1]["entity_id"]
    assert (deg[in_core] >= 2).all()

    ra = entity_resource_allocation(SF).to_pandas()
    assert (ra["ra_ppm"] > 0).all()
    assert (ra["a"] < ra["b"]).all()


def test_gap_median_bruteforce():
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.sequence import gap_median_by_type

    got = gap_median_by_type(SF).to_pandas().set_index("event_type")
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_type", "ts"]
    ).to_pandas()
    ev["t"] = ev["ts"].values.astype("datetime64[us]").astype(np.int64)
    gaps = {}
    for (_, ty), sub in ev.groupby(["user_id", "event_type"]):
        t = np.sort(sub["t"].to_numpy())
        if len(t) > 1:
            gaps.setdefault(ty, []).extend(np.diff(t).tolist())
    for ty, gl in gaps.items():
        s = np.sort(np.array(gl))
        assert got.loc[ty, "median_gap_us"] == int(s[(len(s) + 1) // 2 - 1])


def test_rate_limit_violators_threshold():
    from ner_funtool_ray.pipelines.sequence import rate_limit_violators

    df = rate_limit_violators(SF).to_pandas()
    assert (df["n"] >= 5).all()
    loose = rate_limit_violators(SF, threshold=1).to_pandas()
    assert len(loose) > len(df)


def test_gini_bruteforce_and_bounds():
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.distribution import customer_revenue_gini

    row = customer_revenue_gini(SF).to_pandas().iloc[0]
    assert 0 <= row["gini_ppm"] < 1_000_000
    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]).to_pandas()
    t["c"] = np.round(t["o_totalprice"] * 100).astype(np.int64)
    rev = np.sort(t.groupby("o_custkey")["c"].sum().to_numpy())
    n, total = len(rev), int(rev.sum())
    weighted = int((np.arange(1, n + 1, dtype=object) * rev.astype(object)).sum())
    assert row["gini_ppm"] == ((2 * weighted - (n + 1) * total) * 1_000_000) // (n * total)


def test_event_type_drift_dense_and_bounded():
    from ner_funtool_ray.pipelines.distribution import event_type_drift

    df = event_type_drift(SF).to_pandas()
    assert (np.diff(df["day"]) == 1).all()
    # TV distance = tv_num / (2 t_prev t_cur) in [0, 1]
    assert (df["tv_num"] <= 2 * df["t_prev"] * df["t_cur"]).all()
    assert (df["tv_num"] >= 0).all()


def test_fuzzy_gazetteer_includes_exact_and_respects_distance():
    from ner_funtool_ray.pipelines.textops import _levenshtein, fuzzy_gazetteer_matches

    df = fuzzy_gazetteer_matches(SF).to_pandas()
    assert (df["dist"] <= 1).all()
    exact = df[df["dist"] == 0]
    assert (exact["term"] == exact["token"]).all()
    for r in df.sample(min(15, len(df)), random_state=0).itertuples():
        assert _levenshtein(r.term, r.token) == r.dist


def test_event_type_weekly_counts_window_property():
    import pyarrow.parquet as pq

    from ner_funtool_ray.pipelines.mining import event_type_weekly_counts

    df = event_type_weekly_counts(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts"]).to_pandas()
    day = ev["ts"].values.astype("datetime64[us]").astype(np.int64) // 86_400_000_000
    ev = ev.assign(day=day)
    for r in df.sample(min(20, len(df)), random_state=1).itertuples():
        exp = (
            (ev["event_type"] == r.event_type)
            & (ev["day"] >= r.day - 6)
            & (ev["day"] <= r.day)
        ).sum()
        assert r.trailing_n == exp


def test_ensemble_report_counts_consistent():
    from ner_funtool_ray.pipelines.tagging import ensemble_mentions, model_mentions

    rep = ensemble_mentions(SF).to_pandas()
    assert (rep["n_agree"] <= rep[["n_bilstm", "n_bert"]].min(axis=1)).all()
    a = model_mentions(SF).to_pandas()
    key = ["row_id", "sent_id", "start", "end", "entity_type"]
    assert int(rep["n_bilstm"].sum()) == len(a.drop_duplicates(key))


def test_incremental_dedup_fallback_parity():
    from ner_funtool_ray.pipelines.curation import incremental_dedup_new

    fast = incremental_dedup_new(SF).to_pandas()
    slow = incremental_dedup_new(SF, broadcast_limit=0).to_pandas()
    key = ["doc_id", "fingerprint"]
    pd.testing.assert_frame_equal(
        fast.sort_values(key).reset_index(drop=True),
        slow.sort_values(key).reset_index(drop=True),
    )
