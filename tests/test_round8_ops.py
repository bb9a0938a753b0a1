"""Round-8 additions: URL canonicalization / domain-level dedup / the
composed domain-cap curation pass."""
from __future__ import annotations

import pytest

import re

import pyspark.sql.functions as F


def _final_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_url_canonical_properties(spark, sf_dir):
    """Every canonical URL is free of crawl mess: no tracking params, no
    fragment, no explicit default port, no www., no trailing slash,
    lowercase host — and meaningful params survive."""
    from breweries_case_spark.operators.sampling import q_url_canonicalize

    rows = q_url_canonicalize(spark, sf_dir).collect()
    assert rows
    saw_kept_param = False
    for r in rows:
        c = r.canonical_url
        assert "utm_" not in c
        assert "#" not in c
        assert ":443" not in c and ":80" not in c
        assert "//www." not in c
        host = re.match(r"^https?://([^/?#]+)", c).group(1)
        assert host == host.lower()
        assert r.domain == host
        path = re.match(r"^https?://[^/?#]+([^?#]*)", c).group(1)
        assert not path.endswith("/")
        if "page=" in c:
            saw_kept_param = True
    assert saw_kept_param, "fixture should exercise kept non-utm params"


def test_url_dedup_partitions_corpus(spark, sf_dir):
    """Canonical groups partition the corpus: copies sum to the doc
    count, keepers are the min doc_id of their group, and the fixture
    produces real dup groups (mod-50 path collisions)."""
    from breweries_case_spark.operators.sampling import (
        q_dedup_url,
        q_url_canonicalize,
    )

    canon = {
        r.doc_id: r.canonical_url
        for r in q_url_canonicalize(spark, sf_dir).collect()
    }
    groups = q_dedup_url(spark, sf_dir).collect()
    assert sum(g.copies for g in groups) == len(canon)
    assert any(g.copies > 1 for g in groups), "no dup groups in fixture"
    by_url: dict = {}
    for did, cu in canon.items():
        by_url.setdefault(cu, []).append(did)
    for g in groups:
        assert g.keeper_doc_id == min(by_url[g.canonical_url])


def test_domain_cap_binds_and_plans_window_group_limit(spark, sf_dir):
    """The cap must actually filter at driver SFs (a never-binding cap
    is vacuous) and must plan as WindowGroupLimit so the exchange stays
    O(domains x K) at any corpus size."""
    from breweries_case_spark.operators.sampling import (
        DOMAIN_CAP,
        q_dedup_url,
        q_sample_domain_cap,
    )

    df = q_sample_domain_cap(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    assert "WindowGroupLimit" in _final_plan(df)
    rows = df.collect()
    keepers = q_dedup_url(spark, sf_dir).count()
    assert len(rows) < keepers, "cap never bound — raise fixture or lower cap"
    per_domain: dict = {}
    for r in rows:
        per_domain.setdefault(r.domain, []).append(r.rank_in_domain)
    for dom, ranks in per_domain.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= DOMAIN_CAP


def test_url_canonicalize_idempotent(spark, sf_dir):
    """Canonicalization is a projection: applying it to an already
    canonical URL is the identity (no port/www/utm/fragment left to
    strip, host already lowercase, no trailing slash) — the property
    that makes canonical keys stable under re-crawls of cleaned URLs."""
    from breweries_case_spark.operators.sampling import (
        _canonicalized,
        q_url_canonicalize,
    )

    once = q_url_canonicalize(spark, sf_dir).select(
        F.col("canonical_url").alias("url")
    )
    canonical, host = _canonicalized()
    twice = once.select(
        "url", canonical.alias("again"), host.alias("domain")
    )
    diff = twice.filter(F.col("again") != F.col("url")).count()
    assert diff == 0


def test_bpe_merge_fold_random_streams(spark):
    """The JVM fold equals the pure-Python greedy LTR merge on 300
    random token streams over a two-letter alphabet (maximizing overlap
    islands — the 'a a a' ambiguity corpus text rarely produces), for
    both a self-pair (a,a) and a cross-pair (a,b)."""
    import random

    from breweries_case_spark.operators.text import bpe_merge_fold

    rng = random.Random(8)
    rows = [
        (i, [rng.choice("ab") for _ in range(rng.randint(0, 12))])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, t array<string>")

    def py_merge(toks, left, right):
        out, j = [], 0
        while j < len(toks):
            if j + 1 < len(toks) and toks[j] == left and toks[j + 1] == right:
                out.append(f"{left} {right}")
                j += 2
            else:
                out.append(toks[j])
                j += 1
        return out

    for left, right in (("a", "a"), ("a", "b")):
        got = {
            r.id: r.m
            for r in df.select(
                "id",
                bpe_merge_fold(
                    F.col("t"), F.lit(left), F.lit(right)
                ).alias("m"),
            ).collect()
        }
        for i, toks in rows:
            assert got[i] == py_merge(toks, left, right), (i, toks, left, right)


@pytest.mark.slow
def test_stream_corpus_ingest_equals_batch_pipeline(spark, sf_dir, tmp_path):
    """The streaming shell must be semantically transparent: the
    foreachBatch replay's final corpus equals calling update_corpus
    directly with the same three shards in order."""
    from breweries_case_spark.operators.streaming_queries import (
        CORPUS_SHARD_DATES,
        CORPUS_SHARDS,
        q_stream_corpus_ingest,
    )
    from breweries_case_spark.pipelines.corpus import (
        read_corpus,
        update_corpus,
    )

    streamed = {
        tuple(r)
        for r in q_stream_corpus_ingest(spark, sf_dir).collect()
    }

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    corpus_dir = str(tmp_path / "corpus")
    for i, day in enumerate(CORPUS_SHARD_DATES):
        update_corpus(
            spark,
            d.filter(F.col("doc_id") % CORPUS_SHARDS == i),
            corpus_dir,
            day,
            near_dedup=True,
        )
    batch = {
        tuple(r)
        for r in read_corpus(spark, corpus_dir)
        .select("doc_id", "lang", "source", "shard_date")
        .collect()
    }
    assert streamed == batch


def test_mix_temperature_invariants(spark, sf_dir):
    """Each alpha column is a probability distribution over sources, and
    smaller alpha flattens the mix (strictly smaller spread on any
    corpus with unequal sources)."""
    import math

    from breweries_case_spark.operators.training_mix import (
        q_mix_temperature,
    )

    rows = q_mix_temperature(spark, sf_dir).collect()
    assert len(rows) > 1
    for col in ("p_alpha1", "p_alpha05", "p_alpha025"):
        total = sum(getattr(r, col) for r in rows)
        assert math.isclose(total, 1.0, abs_tol=1e-4), (col, total)
    def spread(col):
        vals = [getattr(r, col) for r in rows]
        m = sum(vals) / len(vals)
        return sum((v - m) ** 2 for v in vals)
    if len({r.ws_tokens for r in rows}) > 1:
        assert spread("p_alpha1") > spread("p_alpha05") > spread("p_alpha025")
    # proportional column recomputes from the exact token totals
    z = sum(r.ws_tokens for r in rows)
    for r in rows:
        want = math.floor(r.ws_tokens / z * 1e6 + 0.5) / 1e6
        assert r.p_alpha1 == want


def test_url_downweight_invariants(spark, sf_dir):
    """Weights invert group sizes; each canonical group's total weight
    is ~1 (so the corpus's effective size equals its distinct-URL
    count); the fixture exercises copies > 1."""
    from breweries_case_spark.operators.sampling import q_url_downweight

    rows = q_url_downweight(spark, sf_dir).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r.canonical_url, []).append(r)
    assert any(len(g) > 1 for g in groups.values())
    for g in groups.values():
        copies = len(g)
        for r in g:
            assert r.copies == copies
            assert abs(r.sample_weight - 1.0 / copies) < 1e-6
        assert abs(sum(r.sample_weight for r in g) - 1.0) < 1e-4


def test_pack_nextfit_properties(spark, sf_dir):
    """Next-fit geometry: offsets are the running prefix sums within
    each bin; no multi-doc bin exceeds the cap; and the defining
    next-fit property — a doc that OPENED bin b+1 genuinely did not fit
    in bin b's final fill."""
    from breweries_case_spark.operators.pandas_ops import (
        PACK_CAP_TOKENS,
        q_pack_nextfit,
    )

    rows = q_pack_nextfit(spark, sf_dir).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert by_lang
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.doc_id)
        end = None
        prev_bin = -1
        for r in rs:
            if end is None or r.bin_idx != prev_bin:
                assert r.bin_idx == prev_bin + 1, "bins must be dense"
                assert r.offset_in_bin == 0
                if end is not None:
                    # the doc could not have fit in the previous bin
                    assert end + r.n_tokens > PACK_CAP_TOKENS
                end = r.n_tokens
                prev_bin = r.bin_idx
            else:
                assert r.offset_in_bin == end
                end += r.n_tokens
                assert end <= PACK_CAP_TOKENS
        assert prev_bin >= 1, f"{lang}: fixture should need several bins"


def test_pack_concat_matches_python_scan(spark, sf_dir):
    """The distributed two-phase prefix scan equals a single-threaded
    Python replay of the same per-lang concat-and-cut, and the fixture
    genuinely exercises example-boundary splits."""
    from breweries_case_spark.operators.pandas_ops import (
        PACK_SEQ_LEN,
        q_pack_concat,
    )

    rows = {r.doc_id: r for r in q_pack_concat(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    by_lang: dict = {}
    for d in docs:
        by_lang.setdefault(d.lang, []).append(d)
    crossers = 0
    for lang, ds in by_lang.items():
        off = 0
        for d in sorted(ds, key=lambda d: d.doc_id):
            n = len(re.split(r"\s+", d.text.strip().lower()))
            r = rows[d.doc_id]
            assert (r.lang, r.n_tokens, r.start_offset) == (lang, n, off)
            assert r.example_first == off // PACK_SEQ_LEN
            assert r.example_last == (off + n - 1) // PACK_SEQ_LEN
            crossers += int(r.example_last > r.example_first)
            off += n
    assert len(rows) == len(docs)
    assert crossers > 0, "fixture must split some docs across examples"


def test_pack_concat_partition_invariant(spark, sf_dir, monkeypatch):
    """Offsets are invariant to the scan's partition count — the
    correctness core of the two-phase scan (whatever boundaries the
    range sampler picks, phase-1 bases make every partition resume at
    the exact global offset)."""
    from breweries_case_spark.operators import pandas_ops

    base = sorted(
        tuple(r) for r in pandas_ops.q_pack_concat(spark, sf_dir).collect()
    )
    monkeypatch.setattr(pandas_ops, "PACK_SCAN_PARTS", 3)
    alt = sorted(
        tuple(r) for r in pandas_ops.q_pack_concat(spark, sf_dir).collect()
    )
    assert base == alt


def test_quality_gate_budget_tight(spark, sf_dir):
    """The gate drops AT MOST floor(25% · n) docs, the cutoff is tight
    (including one more bin would blow the budget), and survival is
    monotone in the score bin (whole bins live or die together)."""
    from breweries_case_spark.operators.text import (
        QG_DROP_PCT,
        q_quality_gate,
        q_quality_score,
    )

    from breweries_case_spark.operators.text import gate_scored

    kept = {r.doc_id: r for r in q_quality_gate(spark, sf_dir).collect()}
    # bins come from the SAME Spark expression the gate bins on (raw
    # score) — re-deriving from the 6dp-rounded published score can
    # mis-bin a score within ~5e-7 of a bin edge
    scored = gate_scored(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).collect()
    assert len(scored) == sum(
        1
        for r in q_quality_score(spark, sf_dir).collect()
        if r.quality_score is not None
    )
    n = len(scored)
    budget = n * QG_DROP_PCT // 100
    dropped = [r for r in scored if r.doc_id not in kept]
    assert len(dropped) <= budget
    assert len(kept) + len(dropped) == n
    if dropped:
        worst_kept = min(kept[r.doc_id].quality_bin for r in scored if r.doc_id in kept)
        # monotone: every dropped doc scores in a bin strictly below
        # every kept doc's bin
        drop_bins = [r.quality_bin for r in dropped]
        assert max(drop_bins) < worst_kept
        # tight: the lowest kept bin would not have fit the drop budget
        lowest_kept_count = sum(
            1 for k in kept.values() if k.quality_bin == worst_kept
        )
        assert len(dropped) + lowest_kept_count > budget


def test_containment_matches_bruteforce(spark, sf_dir):
    """Exact equality with an all-pairs Python recount at sf0.001 —
    the inverted-index candidate join loses nothing."""
    from breweries_case_spark.operators.dedup import (
        CONTAINMENT_THRESHOLD,
        q_dedup_containment,
    )

    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in q_dedup_containment(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    sh: dict = {}
    for d in docs:
        toks = re.split(r"\s+", d.text.strip().lower())
        sh[d.doc_id] = (d.lang, {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)})
    want: dict = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        la, sa = sh[a]
        if not sa:
            continue
        for b in ids[i + 1 :]:
            lb, sb = sh[b]
            if la != lb or not sb:
                continue
            c = (
                __import__("math").floor(
                    len(sa & sb) / min(len(sa), len(sb)) * 1e6 + 0.5
                )
                / 1e6
            )
            if c >= CONTAINMENT_THRESHOLD:
                want[(a, b)] = c
    assert got == want
    assert want, "fixture should contain at least one containment pair"


def test_containment_detects_subset_dup_jaccard_misses(spark, tmp_path):
    """The defining asymmetry: a short doc fully embedded in a long doc
    has containment 1.0 but Jaccard far below the 0.5 tier threshold —
    the subset-duplicate class only this operator catches."""
    from breweries_case_spark.operators.dedup import (
        q_dedup_containment,
        q_dedup_ngram_jaccard,
    )

    small = " ".join(f"tok{i}" for i in range(40))
    big = small + " " + " ".join(f"pad{i}" for i in range(400))
    other = " ".join(f"zz{i}" for i in range(40))
    rows = [
        (1, small, "en", "s", len(small)),
        (2, big, "en", "s", len(big)),
        (3, other, "en", "s", len(other)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in q_dedup_containment(spark, str(tmp_path)).collect()
    }
    assert cont == {(1, 2): 1.0}, cont
    jac = q_dedup_ngram_jaccard(spark, str(tmp_path)).collect()
    assert not jac, "the embedded pair must be invisible to the Jaccard tier"


def test_mix_epochs_invariants(spark, sf_dir):
    """Epoch mix geometry: copy indices are dense per doc; every doc of
    a source gets the same base copy count floor(e_s); the largest
    source runs exactly one epoch; and the fixture exercises a
    fractional source (some docs of a source carry one more copy than
    others — the hash-selected extra)."""
    from breweries_case_spark.operators.training_mix import (
        MIX_MAX_EPOCHS,
        q_mix_epochs,
    )

    rows = q_mix_epochs(spark, sf_dir).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault((r.doc_id, r.source, r.n_copies), []).append(
            r.copy_idx
        )
    copies_by_source: dict = {}
    for (doc_id, source, n_copies), idxs in by_doc.items():
        assert sorted(idxs) == list(range(n_copies)), "copy_idx not dense"
        assert 1 <= n_copies <= MIX_MAX_EPOCHS + 1
        copies_by_source.setdefault(source, set()).add(n_copies)
    # per source at most two distinct copy counts (floor(e) and +1)
    fractional_sources = 0
    for source, counts in copies_by_source.items():
        assert len(counts) <= 2, (source, counts)
        if len(counts) == 2:
            lo, hi = sorted(counts)
            assert hi == lo + 1, (source, counts)
            fractional_sources += 1
    assert fractional_sources > 0, "fixture should exercise fractional epochs"
    # the largest source (by tokens) runs exactly one epoch
    import re as _re

    toks: dict = {}
    for d in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        toks[d.source] = toks.get(d.source, 0) + len(
            _re.split(r"\s+", d.text.strip())
        )
    biggest = max(toks, key=lambda s: toks[s])
    assert copies_by_source[biggest] == {1}


def test_sim_mmr_invariants(spark, sf_dir):
    """MMR geometry on the fixture: K distinct picks from the candidate
    pool, rank 1 is the pure-relevance argmax (ties by vec_id), and the
    greedy score trajectory is non-increasing (a fixed candidate's
    score can only fall as the selected set grows, so the running max
    falls too)."""
    from breweries_case_spark.operators.similarity import (
        MMR_K,
        q_sim_mmr,
        q_sim_topk,
    )

    rows = sorted(q_sim_mmr(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, MMR_K + 1))
    assert len({r.vec_id for r in rows}) == MMR_K
    top1 = q_sim_topk(spark, sf_dir).collect()[0]
    assert rows[0].vec_id == top1.vec_id
    scores = [r.mmr_score for r in rows]
    assert all(a >= b for a, b in zip(scores, scores[1:]))


def test_sim_mmr_defers_duplicates(spark, tmp_path):
    """The defining MMR behavior: an exact duplicate of the top hit —
    which plain top-k ranks second — is pushed down by the diversity
    penalty (its max-sim-to-selected is 1.0 the moment its twin is
    picked)."""
    from breweries_case_spark.operators.similarity import q_sim_mmr

    dim = 64

    def vec(*pairs):
        v = [0.0] * dim
        for i, x in pairs:
            v[i] = x
        return v

    rows = [(0, vec((0, 1.0)), 0)]          # query: e0
    dup = vec((0, 0.8), (1, 0.6))           # cos to q = 0.8
    rows.append((1, dup, 0))
    rows.append((2, list(dup), 0))          # exact duplicate of vec 1
    for k in range(3, 15):                  # cos to q = 0.6, mutually near-orthogonal
        rows.append((k, vec((0, 0.6), (k, 0.8)), 0))
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    out = sorted(
        q_sim_mmr(spark, str(tmp_path)).collect(), key=lambda r: r.rank
    )
    assert out[0].vec_id == 1, "rank 1 must be the most relevant (tie->min id)"
    assert out[1].vec_id != 2, "the exact duplicate must not be rank 2"
    # the duplicate's penalized score is 0.7*0.8 - 0.3*1.0 = 0.26 vs the
    # diverse candidates' 0.7*0.6 - 0.3*max(0.48, 0.36) = 0.276: all 12
    # diverse picks outrank it, so it misses the K=10 output entirely
    # (plain top-k would have ranked it SECOND)
    assert all(r.vec_id != 2 for r in out), "duplicate must be crowded out"


def test_hard_negatives_matches_bruteforce(spark, sf_dir):
    """Every anchor appears exactly once (iff its batch holds another
    label) and its mined negative is the true in-batch argmax by an
    independent numpy recount."""
    import numpy as np

    from breweries_case_spark.operators.similarity import (
        HN_BATCH,
        q_sim_hard_negatives,
    )

    got = {
        r.anchor_id: (r.negative_id, r.anchor_label, r.negative_label)
        for r in q_sim_hard_negatives(spark, sf_dir).collect()
    }
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    labels = {r.vec_id: r.label for r in rows}
    by_batch: dict = {}
    for vid in vecs:
        by_batch.setdefault(vid // HN_BATCH, []).append(vid)
    expected_anchors = 0
    for batch in by_batch.values():
        for a in batch:
            cands = [b for b in batch if labels[b] != labels[a]]
            if not cands:
                assert a not in got
                continue
            expected_anchors += 1
            va = vecs[a]

            def cos(b):
                vb = vecs[b]
                return float(
                    va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
                )

            best = max(cands, key=lambda b: (cos(b), -b))
            neg, al, nl = got[a]
            assert al == labels[a] and nl == labels[neg]
            assert nl != al
            # numpy's reduce order can differ in the last ulp; accept the
            # engine's pick when the scores tie to 1e-12
            assert neg == best or abs(cos(neg) - cos(best)) < 1e-12
    assert len(got) == expected_anchors


def test_containment_cap_certificate(spark, sf_dir):
    """The df-cap blocking certificate: lossless at driver scale
    (missed = 0), candidate volume bounded by the full join (r10: at
    the cluster-sized production DF_CAP=64 no driver-fixture gram
    exceeds the cap, so capped == full here — the actual cut mechanism
    is pinned at df_cap=2 in test_round9_ops), and the exact pair
    count anchors to the unpruned operator."""
    from breweries_case_spark.operators.dedup import (
        q_dedup_containment,
        q_dedup_containment_capped,
    )

    rows = {
        r.check_name: r.value
        for r in q_dedup_containment_capped(spark, sf_dir).collect()
    }
    assert rows["capped_missed_true_pairs"] == 0
    assert 0 < rows["candidate_pairs_capped"] <= rows["candidate_pairs_full"]
    assert rows["exact_pairs"] == q_dedup_containment(spark, sf_dir).count()


def test_training_mix_v2_stage_consistency(spark, sf_dir):
    """The v2 composite must agree with its stage operators: output ⊆
    gate survivors; for every full-corpus containment pair whose BOTH
    docs survive the gate, the contained (smaller-gram-set) side is
    absent from the output; copy counts follow the epoch shape (1..5,
    at most two distinct values per source). The fixture exercises the
    dedup stage (both-survive pairs exist)."""
    from breweries_case_spark.operators.dedup import q_dedup_containment
    from breweries_case_spark.operators.text import q_quality_gate
    from breweries_case_spark.operators.training_mix import (
        MIX_MAX_EPOCHS,
        q_training_mix_v2,
    )

    out = {r.doc_id: r for r in q_training_mix_v2(spark, sf_dir).collect()}
    kept = {r.doc_id for r in q_quality_gate(spark, sf_dir).collect()}
    assert set(out) <= kept

    # gram-set sizes for the smaller-side determination
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    sz = {}
    for d in docs:
        toks = re.split(r"\s+", d.text.strip().lower())
        sz[d.doc_id] = len({" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)})
    both = [
        (r.doc_a, r.doc_b)
        for r in q_dedup_containment(spark, sf_dir).collect()
        if r.doc_a in kept and r.doc_b in kept
    ]
    assert both, "fixture should exercise the composite's dedup stage"
    for a, b in both:
        if sz[a] < sz[b]:
            contained = a
        elif sz[b] < sz[a]:
            contained = b
        else:
            contained = max(a, b)
        assert contained not in out, (a, b, contained)
    copies_by_source: dict = {}
    for r in out.values():
        assert 1 <= r.n_copies <= MIX_MAX_EPOCHS + 1
        copies_by_source.setdefault(r.source, set()).add(r.n_copies)
    for source, counts in copies_by_source.items():
        assert len(counts) <= 2, (source, counts)


def test_quality_gate_degenerate_single_bin(spark, tmp_path):
    """All docs in one score bin: the single bin's cumulative count
    exceeds any fractional drop budget, so the cutoff is NULL and the
    gate keeps EVERYTHING — whole-bin semantics can never drop the
    only bin."""
    from breweries_case_spark.operators.text import q_quality_gate

    rows = [(i, "same text here now", "en", "s", 18) for i in range(20)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = q_quality_gate(spark, str(tmp_path)).collect()
    assert len(out) == 20
    assert len({r.quality_bin for r in out}) == 1


def test_mix_epochs_single_source_one_epoch(spark, tmp_path):
    """A single source IS the largest source: e = 1.0 exactly, zero
    fractional part, so every doc gets exactly one copy."""
    from breweries_case_spark.operators.training_mix import q_mix_epochs

    rows = [
        (i, " ".join(f"w{j}" for j in range(5 + i % 3)), "en", "only", 30)
        for i in range(15)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = q_mix_epochs(spark, str(tmp_path)).collect()
    assert len(out) == 15
    assert all(r.n_copies == 1 and r.copy_idx == 0 for r in out)


def test_pack_concat_single_token_docs(spark, tmp_path):
    """Minimal docs (one token each): offsets are 0,1,2,... per lang and
    nothing crosses an example boundary below PACK_SEQ_LEN docs."""
    from breweries_case_spark.operators.pandas_ops import q_pack_concat

    rows = [(i, f"tok{i}", "en" if i % 2 else "de", "s", 6) for i in range(30)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = sorted(
        q_pack_concat(spark, str(tmp_path)).collect(),
        key=lambda r: (r.lang, r.doc_id),
    )
    by_lang: dict = {}
    for r in out:
        assert r.n_tokens == 1
        assert r.example_first == r.example_last == r.start_offset // 256
        exp = by_lang.get(r.lang, 0)
        assert r.start_offset == exp
        by_lang[r.lang] = exp + 1
    assert set(by_lang.values()) == {15}


def test_events_debounce_recurrence_not_lag(spark, sf_dir, tmp_path):
    """Debounce keeps iff gap to the last KEPT event exceeds Δ — a
    recurrence lag cannot express. Synthetic chain at 0 / 70 / 130 min
    with Δ=120 min: the 130-min event IS kept (130 > 120 from the kept
    t=0) though its gap to the previous ROW is only 60 min — a
    lag-based filter would wrongly drop it. Plus a full Python replay
    on the fixture."""
    import datetime as dt

    from breweries_case_spark.operators.streaming_queries import (
        DEBOUNCE_US,
        q_events_debounce,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base, 1, "click", 1.0, "{}"),
        (1, base + dt.timedelta(minutes=70), 1, "click", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=130), 1, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    kept = sorted(
        r.event_id for r in q_events_debounce(spark, str(tmp_path)).collect()
    )
    assert kept == [0, 2], kept

    # fixture replay
    got = {
        (r.user_id, r.event_id) for r in q_events_debounce(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_user: dict = {}
    for e in ev:
        by_user.setdefault(e.user_id, []).append(e)
    want = set()
    for uid, es in by_user.items():
        es.sort(key=lambda e: (e.ts, e.event_id))
        last = None
        for e in es:
            us = int(e.ts.timestamp() * 1_000_000)
            if last is None or us - last > DEBOUNCE_US:
                want.add((uid, e.event_id))
                last = us
    assert got == want
    assert len(got) < len(ev), "fixture should exercise real drops"


def test_second_wave_plan_shapes(spark, sf_dir):
    """Pin the scale-critical plan facts of the wave under the
    deterministic test profile (AQE off, fixed shuffle partitions):
    the concat-pack scan is exchange-FREE in its final plan (both
    phases ride the checkpointed range layout), debounce shuffles
    exactly once (user_id), and the rest stay within their documented
    exchange budgets with no nested-loop joins anywhere."""
    from breweries_case_spark.operators.dedup import q_dedup_containment
    from breweries_case_spark.operators.pandas_ops import q_pack_concat
    from breweries_case_spark.operators.similarity import (
        q_sim_hard_negatives,
    )
    from breweries_case_spark.operators.streaming_queries import (
        q_events_debounce,
    )
    from breweries_case_spark.operators.text import q_quality_gate

    budgets = {
        q_pack_concat: 0,
        q_events_debounce: 1,
        q_dedup_containment: 2,
        q_sim_hard_negatives: 2,
        q_quality_gate: 3,
    }
    for fn, budget in budgets.items():
        df = fn(spark, sf_dir)
        df.count()
        plan = _final_plan(df)
        n_ex = plan.count("Exchange")
        assert n_ex <= budget, (fn.__name__, n_ex, budget)
        assert "CartesianProduct" not in plan, fn.__name__
        # the gate's 1-row cutoff crossJoin plans as a broadcast NL by
        # design (NESTED_LOOP_OK in the sweep); everything else must
        # stay nested-loop-free
        if fn is not q_quality_gate:
            assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
    # the structural headline: zero exchanges in the pack scan
    df = q_pack_concat(spark, sf_dir)
    df.count()
    assert "Exchange" not in _final_plan(df)


def test_pack_manifest_tiles_examples(spark, sf_dir):
    """Every example is exactly tiled: within each (lang, example) the
    doc slices are disjoint, start at offset 0, chain end-to-start, and
    sum to PACK_SEQ_LEN for all but each lang's final partial example."""
    from breweries_case_spark.operators.pandas_ops import (
        PACK_SEQ_LEN,
        q_pack_manifest,
    )

    rows = q_pack_manifest(spark, sf_dir).collect()
    by_ex: dict = {}
    for r in rows:
        assert r.tokens_in_example >= 1
        by_ex.setdefault((r.lang, r.example_id), []).append(r)
    langs: dict = {}
    for (lang, ex), rs in by_ex.items():
        langs.setdefault(lang, set()).add(ex)
        rs.sort(key=lambda r: r.offset_in_example)
        pos = 0
        for r in rs:
            assert r.offset_in_example == pos, (lang, ex)
            pos += r.tokens_in_example
        assert pos <= PACK_SEQ_LEN
    for lang, exs in langs.items():
        assert sorted(exs) == list(range(len(exs))), "example ids dense"
        last = max(exs)
        for ex in exs:
            total = sum(r.tokens_in_example for r in by_ex[(lang, ex)])
            if ex < last:
                assert total == PACK_SEQ_LEN, (lang, ex, total)
