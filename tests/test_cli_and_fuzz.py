"""CLI end-to-end (indexer + query_processor TREC evaluation mode) and
hypothesis property fuzzing of the codec kernels."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mircv_ray.codecs.blocks import decode_block_ids, decode_block_tfs, encode_blocks
from mircv_ray.codecs.unary import unary_decode, unary_decode_blocks, unary_encode
from mircv_ray.codecs.vbyte import vbyte_decode, vbyte_encode

REPO = Path(__file__).resolve().parent.parent


class TestCodecFuzz:
    @given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
    @settings(max_examples=50, deadline=None)
    def test_vbyte_roundtrip(self, values):
        arr = np.array(values, dtype=np.int64)
        assert vbyte_decode(vbyte_encode(arr), len(arr)).tolist() == values

    @given(st.lists(st.integers(min_value=0, max_value=300),
                    min_size=1, max_size=100))
    @settings(max_examples=50, deadline=None)
    def test_unary_roundtrip(self, values):
        arr = np.array(values, dtype=np.int64)
        assert unary_decode(unary_encode(arr), len(arr)).tolist() == values

    @given(st.lists(st.lists(st.integers(min_value=0, max_value=50),
                             min_size=1, max_size=30),
                    min_size=1, max_size=10))
    @settings(max_examples=30, deadline=None)
    def test_unary_decode_blocks_equals_per_block(self, blocks):
        bufs = [unary_encode(np.array(b, dtype=np.int64)) for b in blocks]
        counts = [len(b) for b in blocks]
        batched = unary_decode_blocks(bufs, counts)
        ref = np.concatenate([unary_decode(buf, c)
                              for buf, c in zip(bufs, counts)])
        assert batched.tolist() == ref.tolist()

    @given(st.sets(st.integers(min_value=1, max_value=10**7),
                   min_size=1, max_size=400),
           st.sampled_from(["vbyte", "ef", "none"]))
    @settings(max_examples=40, deadline=None)
    def test_block_roundtrip_any_codec(self, id_set, codec):
        ids = np.array(sorted(id_set), dtype=np.int64)
        tfs = (ids % 7) + 1
        enc = encode_blocks(ids, tfs, codec, threshold=64)  # force blocks
        out_ids, out_tfs, prev = [], [], 0
        for mx, n, ib, tb in zip(enc["max_doc_id"], enc["n"],
                                 enc["ids"], enc["tfs"]):
            out_ids.append(decode_block_ids(ib, codec, n, mx, prev))
            out_tfs.append(decode_block_tfs(tb, codec, n))
            prev = mx
        assert np.concatenate(out_ids).tolist() == ids.tolist()
        assert np.concatenate(out_tfs).tolist() == tfs.tolist()


class TestCLI:
    def test_indexer_and_trec_eval(self, ray_session, tmp_path):
        """Build via the indexer CLI, then score a TREC query file via the
        query_processor CLI; the run file must match the in-process
        engine's results line for line."""
        from mircv_ray.config import QueryConfig
        from mircv_ray.query import QueryEngine
        from mircv_ray.sources import generate_corpus_table

        corpus_dir = tmp_path / "corpus"
        corpus_dir.mkdir()
        pq.write_table(
            generate_corpus_table(60, seed=33).drop_columns(["sha256"]),
            corpus_dir / "part-0.parquet")
        idx = tmp_path / "idx"
        r = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "indexer.py"),
             str(corpus_dir), str(idx), "--num-shards", "2",
             "--num-cpus", "2"],
            capture_output=True, text=True, cwd=REPO)
        assert r.returncode == 0, r.stderr[-2000:]
        assert (idx / "stats.json").exists()

        queries = tmp_path / "q.tsv"
        queries.write_text("1\tdef return value\n2\thash map dict\n")
        run_out = tmp_path / "run.txt"
        r = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "query_processor.py"),
             str(idx), "--standard", "BM25", "--k", "5",
             "--eval", str(queries), "--run-out", str(run_out)],
            capture_output=True, text=True, cwd=REPO)
        assert r.returncode == 0, r.stderr[-2000:]
        lines = run_out.read_text().splitlines()
        assert lines, "run file is empty"
        eng = QueryEngine(str(idx), QueryConfig(standard="BM25", k=5))
        want = []
        for qid, text in [("1", "def return value"), ("2", "hash map dict")]:
            for rank, (docno, score) in enumerate(
                    eng.query(text, conjunctive=False, sort_terms=True),
                    start=1):
                want.append(f"{qid} Q0 {docno} {rank} {score} BM25")
        assert lines == want


TREC2020 = "/root/reference/evaluation/msmarco-test2020-queries.tsv"


def test_eval_mode_on_reference_trec2020_queries(ray_session, tmp_path):
    """S8/M12/M13/Q5 over the reference's REAL TREC-DL-2020 query file
    (200 queries) against a synthetic index: run-file format, rank
    contiguity and score monotonicity per query. (Rank/score identity vs
    the reference's qres_* files needs the MS MARCO collection, which is
    not in the sandbox.)"""
    import subprocess
    import sys
    from pathlib import Path

    import pytest
    if not Path(TREC2020).exists():
        pytest.skip("reference query file not available")

    import ray.data as rd

    from mircv_ray.build import build_index
    from mircv_ray.config import IndexConfig
    from mircv_ray.sources import documents_as_corpus
    idx = tmp_path / "idx"
    build_index(documents_as_corpus("/root/testdata/sf0.001"), str(idx),
                IndexConfig(parse=True, num_shards=4, salt_buckets=2))
    run = tmp_path / "run.txt"
    qrels = Path("/root/reference/evaluation/qrels.txt")
    out = subprocess.run(
        [sys.executable, "scripts/query_processor.py", str(idx),
         "--standard", "BM25", "--k", "20",
         "--eval", TREC2020, "--run-out", str(run)]
        + (["--qrels", str(qrels), "--map-rel-threshold", "2"]
           if qrels.exists() else []),
        capture_output=True, text=True, timeout=600,
        cwd=str(Path(__file__).resolve().parent.parent))
    assert out.returncode == 0, out.stderr[-2000:]
    assert "200 queries" in out.stdout
    if qrels.exists():
        # --qrels wiring: metrics print (docnos are synthetic, so the
        # values are ~0 — parity needs the MS MARCO collection)
        assert "MAP@20 = " in out.stdout and "NDCG@20 = " in out.stdout
    lines = run.read_text().splitlines()
    assert lines, "run file empty"
    per_qid_rank = {}
    per_qid_score = {}
    for ln in lines:
        qid, q0, docno, rank, score, std = ln.split()
        assert q0 == "Q0" and std == "BM25"
        assert docno.lstrip("-").isdigit()
        r, s = int(rank), float(score)
        assert r == per_qid_rank.get(qid, 0) + 1     # contiguous ranks
        per_qid_rank[qid] = r
        if qid in per_qid_score:
            assert s <= per_qid_score[qid] + 1e-12   # descending scores
        per_qid_score[qid] = s
        assert r <= 20
    # the synthetic corpus has a code-ish vocabulary, so most
    # natural-language queries legitimately return nothing after
    # stopword removal — but the full 200 were processed (stdout) and
    # the ones that do hit produce well-formed rankings
    assert len(per_qid_rank) >= 1
