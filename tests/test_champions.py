"""champion_lists: per-term top-m postings by tf (IIR §7.1.3)."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    import ray.data as rd
    from mircv_ray.build import build_index
    from mircv_ray.config import IndexConfig
    rng = np.random.default_rng(17)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = []
    for i in range(80):
        n = rng.integers(5, 40)
        docs.append(" ".join(rng.choice(words, size=n)))
    corpus = pa.table({
        "repo": pa.array(["r"] * 80), "path": pa.array(
            [f"d{i}" for i in range(80)]),
        "lang": pa.array(["txt"] * 80), "content": pa.array(docs),
    })
    out = str(tmp_path_factory.mktemp("champ") / "idx")
    cfg = IndexConfig(parse=False, squeeze=False, codec="vbyte",
                      num_shards=4, salt_buckets=2)
    build_index(rd.from_arrow(corpus), out, cfg)
    return out, docs


class TestChampionLists:
    def _brute(self, docs, m):
        # docnos follow sorted (repo, path) order: "d0" < "d1" < "d10"...
        from collections import Counter
        order = sorted(range(len(docs)), key=lambda i: f"d{i}")
        docno = {i: rank for rank, i in enumerate(order)}
        want = {}
        for i, text in enumerate(docs):
            for t, c in Counter(text.split()).items():
                want.setdefault(t, []).append((-c, docno[i]))
        return {t: sorted(v)[:m] for t, v in want.items()}

    @pytest.mark.parametrize("m", [1, 3, 10])
    def test_matches_brute_force(self, small_index, m):
        from mircv_ray.query.champions import champion_lists
        out_dir, docs = small_index
        got = (champion_lists(out_dir, m=m, docno_offset=-1)
               .to_pandas().sort_values(["term", "doc_id"]))
        want = self._brute(docs, m)
        assert set(got.term) == set(want)
        for t, g in got.groupby("term"):
            rows = sorted(zip(-g.tf.to_numpy(), g.doc_id.to_numpy()))
            assert rows == want[t], t

    def test_validation(self, small_index):
        from mircv_ray.query.champions import champion_lists
        with pytest.raises(ValueError):
            champion_lists(small_index[0], m=0)
