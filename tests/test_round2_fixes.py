"""Round-2 regression tests: ADVICE.md fixes + sessions determinism."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# ------------------------------------------------------------- sha256 helper

def test_sha256_column_matches_hashlib_and_nulls():
    import hashlib

    from mircv_ray.util import NULL_HASH, sha256_hex_column
    vals = ["abc", "", None, "x" * 1000, "café"]
    arr = pa.array(vals, type=pa.string())
    out = sha256_hex_column(arr, null_sentinel=NULL_HASH).to_pylist()
    for v, h in zip(vals, out):
        if v is None:
            assert h == NULL_HASH
        else:
            assert h == hashlib.sha256(v.encode()).hexdigest()
    # NULL is distinct from empty string
    assert out[2] != out[1]
    # sliced array (non-zero offset) still hashes the right values
    sl = pa.array(vals[:2], type=pa.string())
    chunked = pa.chunked_array([sl]).combine_chunks()
    assert sha256_hex_column(chunked).to_pylist() == out[:2]


def test_exact_dedup_null_vs_empty(ray_session):
    import ray.data as rd

    from mircv_ray.ops import exact_dedup_keep
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "text": pa.array(["", None, "", None])})
    out = exact_dedup_keep(rd.from_arrow(t)).to_pandas()
    # two distinct groups: the two ''s and the two NULLs
    assert len(out) == 2
    assert sorted(out["n_dups"]) == [2, 2]
    assert sorted(out["keep_id"]) == [1, 2]


# ------------------------------------------------- explode zero-token batches

def test_build_with_all_stopword_docs(ray_session, tmp_path):
    """Docs that tokenize to zero tokens (all stopwords / punctuation) pass
    the blank filter but must not crash the explode stage."""
    import ray.data as rd

    from mircv_ray.build import build_index
    from mircv_ray.config import IndexConfig
    n = 8
    t = pa.table({
        "repo": pa.array(["r"] * n),
        "path": pa.array([f"f{i:02d}" for i in range(n)]),
        "commit": pa.array(["c"] * n),
        "lang": pa.array(["py"] * n),
        # parse=True: 'the of and' stems/stops to nothing; '!!! ...' is
        # punctuation-only
        "content": pa.array(["the of and", "!!! ... ???"] * (n // 2)),
    })
    # single tiny batch per block so at least one explode batch is empty
    ds = rd.from_arrow(t).repartition(4)
    stats = build_index(ds, str(tmp_path / "idx"),
                        IndexConfig(parse=True, num_shards=2, salt_buckets=1,
                                    explode_batch_size=2))
    assert stats["n_docs"] == n
    assert stats["metrics"]["n_postings"] == 0 or "n_postings" not in stats["metrics"]


# ------------------------------------------------------ duplicate-key checks

def test_distributed_assign_ids_rejects_duplicates(ray_session):
    import ray
    import ray.data as rd

    from mircv_ray.build.index_build import _make_assign_ids
    t = pa.table({"repo": pa.array(["r", "r", "r"]),
                  "path": pa.array(["a", "b", "a"])})
    bases_ref = ray.put({"r": 0})
    fn = _make_assign_ids(bases_ref)
    with pytest.raises(ValueError, match="duplicate"):
        fn(t)


# ----------------------------------------------------- stale-stage resumption

def test_incomplete_stage_output_is_cleared(ray_session, tmp_path):
    """A crashed stage leaves partial parquet with no manifest; the rerun
    must clear it instead of double-counting (ADVICE.md medium)."""
    from mircv_ray.build import build_index
    from mircv_ray.config import IndexConfig
    from mircv_ray.sources.corpus import generate_corpus_table
    import ray.data as rd
    out = tmp_path / "idx"
    corpus = generate_corpus_table(40, with_sha=False)
    cfg = IndexConfig(parse=False, num_shards=2, salt_buckets=1)
    stats1 = build_index(rd.from_arrow(corpus), str(out), cfg)
    # simulate a crash mid-docs-stage on a FRESH build: leftover partial
    # file present, manifest absent
    import shutil
    shutil.rmtree(out / "_manifests")
    stale = out / "docs" / "zz-stale-partial.parquet"
    pq.write_table(pq.read_table(out / "docs"), stale)
    stats2 = build_index(rd.from_arrow(corpus), str(out), cfg)
    assert not stale.exists()
    assert stats2["n_docs"] == stats1["n_docs"]
    assert stats2["metrics"]["n_postings"] == stats1["metrics"]["n_postings"]


# ------------------------------------------------------- corpus input guards

def test_documents_as_corpus_rejects_blank_text(ray_session, tmp_path):
    from mircv_ray.sources import documents_as_corpus
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["ok text", "   ", "more"]),
        "lang": pa.array(["en"] * 3),
    }), d / "documents.parquet")
    with pytest.raises(Exception, match="blank"):
        documents_as_corpus(str(d)).materialize()


# ------------------------------------------------------ sessions determinism

def test_sessionize_rounding_half_away(ray_session):
    import ray.data as rd

    from mircv_ray.ops import sessionize
    # one user, one session; values sum to 0.125 -> 12.5 cents: DuckDB
    # round() is half away from zero => 13
    t = pa.table({
        "user_id": pa.array([7, 7], type=pa.int64()),
        "ts": pa.array([1_000_000, 2_000_000], type=pa.timestamp("us")),
        "event_id": pa.array([1, 2], type=pa.int64()),
        "value": pa.array([0.0625, 0.0625], type=pa.float64()),
    })
    out = sessionize(rd.from_arrow(t)).to_pandas()
    assert len(out) == 1
    assert int(out["sum_value_cents"][0]) == 13


# ----------------------------------------------- id-mapping join scale path

def test_idmap_join_path_matches_broadcast(ray_session, tmp_path, monkeypatch):
    """Forcing the >DRIVER_IDMAP_MAX_ROWS branch (hash-join id attach)
    must produce an index identical to the broadcast path — and the
    join-based resume (docs checkpointed, postings rebuilt) must too."""
    import ray.data as rd

    from mircv_ray.build import build_index
    from mircv_ray.build import index_build as ib
    from mircv_ray.config import IndexConfig
    from mircv_ray.query.dump import dump_postings
    from mircv_ray.sources.corpus import generate_corpus_table

    corpus = generate_corpus_table(120, with_sha=False)
    cfg = IndexConfig(parse=True, num_shards=2, salt_buckets=2)

    def canon_docs(d):
        t = pq.read_table(d / "docs",
                          columns=["repo", "path", "doc_id", "doc_len",
                                   "sha256"])
        import pyarrow.compute as pc
        return t.take(pc.sort_indices(t["doc_id"]))

    def canon_lex(d):
        t = pq.read_table(d / "lexicon")
        import pyarrow.compute as pc
        return t.take(pc.sort_indices(t["term"]))

    def canon_posts(d):
        import pyarrow.compute as pc
        import ray
        ds = dump_postings(str(d))
        t = pa.concat_tables(ray.get(ds.to_arrow_refs())).combine_chunks()
        return t.take(pc.sort_indices(
            t, sort_keys=[("term", "ascending"), ("doc_id", "ascending")]))

    s_a = build_index(rd.from_arrow(corpus), str(tmp_path / "a"), cfg)
    monkeypatch.setattr(ib, "DRIVER_IDMAP_MAX_ROWS", 0)
    s_b = build_index(rd.from_arrow(corpus), str(tmp_path / "b"), cfg)
    assert s_a["n_docs"] == s_b["n_docs"]
    assert s_a["metrics"]["n_postings"] == s_b["metrics"]["n_postings"]
    assert canon_docs(tmp_path / "a").equals(canon_docs(tmp_path / "b"))
    assert canon_lex(tmp_path / "a").equals(canon_lex(tmp_path / "b"))
    assert canon_posts(tmp_path / "a").equals(canon_posts(tmp_path / "b"))

    # join-based RESUME: docs checkpoint kept, postings+lexicon rebuilt
    for stage in ("postings", "lexicon"):
        (tmp_path / "b" / "_manifests" / f"{stage}.json").unlink()
    s_c = build_index(rd.from_arrow(corpus), str(tmp_path / "b"), cfg)
    assert s_c["metrics"]["n_postings"] == s_a["metrics"]["n_postings"]
    assert canon_posts(tmp_path / "a").equals(canon_posts(tmp_path / "b"))
