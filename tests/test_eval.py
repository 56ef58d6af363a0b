"""MAP@k / NDCG@k scorer vs hand-computed values (VERDICT r2 item 5).

The fixture mirrors trec_eval semantics: score-desc/docno-desc ordering,
map_cut normalized by total relevant, ndcg_cut with linear gain, and
judged-but-unretrieved queries counting as zero.
"""

import math

import pytest

from mircv_ray.eval import (average_precision_at_k, evaluate_run,
                            load_qrels, load_run, ndcg_at_k)

QRELS = """\
q1 0 d1 2
q1 0 d2 1
q1 0 d3 0
q1 0 d4 3
q2 0 d1 1
q3 0 d9 2
"""

RUN = """\
q1 Q0 d2 1 3.0 T
q1 Q0 d4 2 2.5 T
q1 Q0 d5 3 2.0 T
q1 Q0 d1 4 1.0 T
q2 Q0 d1 1 1.0 T
q2 Q0 d7 2 0.5 T
"""


@pytest.fixture
def paths(tmp_path):
    q = tmp_path / "qrels.txt"
    r = tmp_path / "run.txt"
    q.write_text(QRELS)
    r.write_text(RUN)
    return str(r), str(q)


class TestLoaders:
    def test_qrels(self, paths):
        _, qp = paths
        qrels = load_qrels(qp)
        assert qrels["q1"] == {"d1": 2, "d2": 1, "d3": 0, "d4": 3}
        assert qrels["q3"] == {"d9": 2}

    def test_run_sorted_by_score_then_docno_desc(self, tmp_path):
        p = tmp_path / "r.txt"
        # d9 and d2 tie on score: trec_eval breaks ties by docno DESC
        p.write_text("q1 Q0 d2 1 1.0 T\nq1 Q0 d9 2 1.0 T\n"
                     "q1 Q0 d5 3 7.0 T\n")
        assert load_run(p)["q1"] == ["d5", "d9", "d2"]


class TestHandComputed:
    def test_ap_at_3_threshold_1(self, paths):
        rp, qp = paths
        run, qrels = load_run(rp), load_qrels(qp)
        # q1 top3 = d2(hit P@1=1), d4(hit P@2=1), d5(miss); R=3
        assert average_precision_at_k(run["q1"], qrels["q1"], k=3) \
            == pytest.approx(2 / 3)
        assert average_precision_at_k(run["q2"], qrels["q2"], k=3) == 1.0

    def test_ap_threshold_2_binarizes(self, paths):
        rp, qp = paths
        run, qrels = load_run(rp), load_qrels(qp)
        # rel>=2: q1 relevant {d1, d4}, R=2; only d4 hit in top3 at rank 2
        assert average_precision_at_k(run["q1"], qrels["q1"], k=3,
                                      rel_threshold=2) \
            == pytest.approx((1 / 2) / 2)
        # q2 has no rel>=2 judgment -> 0
        assert average_precision_at_k(run["q2"], qrels["q2"], k=3,
                                      rel_threshold=2) == 0.0

    def test_ndcg_at_3(self, paths):
        rp, qp = paths
        run, qrels = load_run(rp), load_qrels(qp)
        dcg = 1 / math.log2(2) + 3 / math.log2(3)           # d2, d4, d5
        idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
        assert ndcg_at_k(run["q1"], qrels["q1"], k=3) \
            == pytest.approx(dcg / idcg)
        assert ndcg_at_k(run["q2"], qrels["q2"], k=3) == 1.0

    def test_evaluate_run_means_include_missing_query(self, paths):
        rp, qp = paths
        m = evaluate_run(rp, qp, k=3)
        # q3 is judged but absent from the run -> contributes 0 to both
        assert m["num_queries"] == 3
        assert m["map_cut"] == pytest.approx((2 / 3 + 1.0 + 0.0) / 3)
        dcg = 1 / math.log2(2) + 3 / math.log2(3)
        idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
        assert m["ndcg_cut"] == pytest.approx((dcg / idcg + 1.0 + 0.0) / 3)

    def test_perfect_run_scores_1(self, tmp_path):
        q = tmp_path / "q.txt"
        r = tmp_path / "r.txt"
        q.write_text("q1 0 d1 3\nq1 0 d2 2\nq1 0 d3 1\n")
        r.write_text("q1 Q0 d1 1 9.0 T\nq1 Q0 d2 2 8.0 T\n"
                     "q1 Q0 d3 3 7.0 T\n")
        m = evaluate_run(r, q, k=20)
        assert m["map_cut"] == pytest.approx(1.0)
        assert m["ndcg_cut"] == pytest.approx(1.0)

    def test_reference_qrels_parse(self):
        """The real TREC-DL-2020 qrels must load (11 386 judgments —
        the file has 11 385 newlines but no trailing one)."""
        import os
        path = "/root/reference/evaluation/qrels.txt"
        if not os.path.exists(path):
            pytest.skip("reference qrels not available")
        qrels = load_qrels(path)
        assert sum(len(v) for v in qrels.values()) == 11386
        assert all(0 <= r <= 3 for v in qrels.values() for r in v.values())
