"""Golden-run parity hook (VERDICT r3 item 8).

The reference ships 200-query golden runs over the full MS MARCO
passage collection (`/root/reference/evaluation/qres_*_not_parsed.txt`,
rank + full-precision score). `collection.tsv` is NOT in this sandbox,
so the full-parity test auto-skips; the moment `data/collection.tsv`
exists (8.8M passages, `pid \t text`), it builds the not-parsed index,
runs the reference's TREC-DL-2020 queries and asserts rank identity +
1e-6 relative score agreement via `mircv_ray.eval.compare_runs`.

One-command equivalent:
    python scripts/query_processor.py IDX --no-parse --k 20 \
        --eval /root/reference/evaluation/msmarco-test2020-queries.tsv \
        --run-out run.txt \
        --golden /root/reference/evaluation/qres_BM25_not_parsed.txt

`compare_runs` itself is exercised unconditionally on synthetic runs.
"""

from pathlib import Path

import pytest

from mircv_ray.eval import compare_runs

REPO = Path(__file__).resolve().parent.parent
COLLECTION = REPO / "data" / "collection.tsv"
REF_EVAL = Path("/root/reference/evaluation")
GOLDEN = REF_EVAL / "qres_BM25_not_parsed.txt"
QUERIES = REF_EVAL / "msmarco-test2020-queries.tsv"


class TestCompareRuns:
    def _write(self, p: Path, rows):
        p.write_text("".join(f"{q} Q0 {d} {r} {s} BM25\n"
                             for q, d, r, s in rows))

    def test_identical_ok(self, tmp_path):
        rows = [("1", "d9", 1, 2.5), ("1", "d3", 2, 1.25),
                ("2", "d1", 1, 0.5)]
        self._write(tmp_path / "a.txt", rows)
        self._write(tmp_path / "b.txt", rows)
        rep = compare_runs(tmp_path / "a.txt", tmp_path / "b.txt")
        assert rep["ok"] and rep["num_shared_queries"] == 2
        assert rep["max_score_rel_diff"] == 0.0

    def test_rank_swap_flagged(self, tmp_path):
        self._write(tmp_path / "a.txt",
                    [("1", "d9", 1, 2.5), ("1", "d3", 2, 1.25)])
        self._write(tmp_path / "b.txt",
                    [("1", "d3", 1, 2.5), ("1", "d9", 2, 1.25)])
        rep = compare_runs(tmp_path / "a.txt", tmp_path / "b.txt")
        assert not rep["ok"] and rep["rank_mismatch_qids"] == ["1"]

    def test_score_drift_flagged_within_tol_ok(self, tmp_path):
        self._write(tmp_path / "a.txt", [("1", "d9", 1, 2.5)])
        self._write(tmp_path / "b.txt", [("1", "d9", 1, 2.5000001)])
        rep = compare_runs(tmp_path / "a.txt", tmp_path / "b.txt",
                           score_rtol=1e-6)
        assert rep["ok"]          # 4e-8 rel diff within 1e-6
        rep = compare_runs(tmp_path / "a.txt", tmp_path / "b.txt",
                           score_rtol=1e-9)
        assert not rep["ok"] and rep["score_mismatch_qids"] == ["1"]

    def test_golden_file_parses(self):
        # the reference's real golden run is readable and non-trivial
        if not GOLDEN.exists():
            pytest.skip("reference evaluation assets absent")
        rep = compare_runs(GOLDEN, GOLDEN)
        assert rep["ok"] and rep["num_shared_queries"] == 200


@pytest.mark.skipif(not COLLECTION.exists(),
                    reason="MS MARCO data/collection.tsv not present in "
                           "this sandbox (8.8M-passage download)")
def test_bm25_not_parsed_golden_parity(ray_session, tmp_path):
    """Full rank+score parity vs the reference's golden BM25 run —
    activates automatically when the MS MARCO collection exists."""
    import ray.data as rd

    from mircv_ray.build import build_index
    from mircv_ray.config import IndexConfig, QueryConfig
    from mircv_ray.query import QueryEngine
    from mircv_ray.sources import collection_tsv_as_corpus

    idx = str(tmp_path / "msmarco_noparse")
    build_index(collection_tsv_as_corpus(str(COLLECTION)), idx,
                IndexConfig(parse=False, codec="vbyte",
                            num_shards=64, salt_buckets=4))
    eng = QueryEngine(idx, QueryConfig(standard="BM25", k=20, parse=False))
    run = tmp_path / "run.txt"
    rows = []
    with open(QUERIES) as f:
        for line in f:
            if "\t" not in line:
                continue
            qid, text = line.rstrip("\n").split("\t", 1)
            for rank, (docno, score) in enumerate(
                    eng.query(text, conjunctive=False, sort_terms=True),
                    start=1):
                rows.append(f"{qid} Q0 {docno} {rank} {score} BM25\n")
    run.write_text("".join(rows))
    rep = compare_runs(run, GOLDEN, k=20, score_rtol=1e-6)
    assert rep["ok"], rep
