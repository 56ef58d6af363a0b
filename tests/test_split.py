"""hash_split: deterministic, partition-independent dataset splitting."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from mircv_ray.ops import hash_split

FR = {"train": 0.8, "val": 0.1, "test": 0.1}


def _collect(ds):
    import ray
    tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(tbls).combine_chunks()
    return t.take(pc.sort_indices(t["doc_id"]))


def _ids(n=50_000):
    return pa.table({"doc_id": pa.array(np.arange(n), type=pa.int64())})


class TestHashSplit:
    @pytest.mark.parametrize("mode", ["crc32", "knuth32"])
    def test_fractions_respected(self, ray_session, mode):
        import ray.data as rd
        got = _collect(hash_split(rd.from_arrow(_ids()), "doc_id", FR,
                                  hash_mode=mode))
        counts = dict(zip(*np.unique(got["split"].to_numpy(
            zero_copy_only=False), return_counts=True)))
        n = got.num_rows
        for name, f in FR.items():
            assert abs(counts[name] / n - f) < 0.01, (mode, name)

    @pytest.mark.parametrize("mode", ["crc32", "knuth32"])
    def test_partition_independent(self, ray_session, mode):
        import ray.data as rd
        t = _ids(8_000)
        a = _collect(hash_split(rd.from_arrow(t).repartition(1),
                                "doc_id", FR, hash_mode=mode))
        b = _collect(hash_split(rd.from_arrow(t).repartition(32),
                                "doc_id", FR, hash_mode=mode))
        assert a.equals(b)

    def test_complete_and_disjoint(self, ray_session):
        import ray.data as rd
        got = _collect(hash_split(rd.from_arrow(_ids(10_000)),
                                  "doc_id", FR))
        assert got.num_rows == 10_000           # every row assigned once
        assert set(got["split"].to_pylist()) == set(FR)

    def test_salt_changes_assignment(self, ray_session):
        import ray.data as rd
        t = _ids(5_000)
        a = _collect(hash_split(rd.from_arrow(t), "doc_id", FR, salt=0))
        b = _collect(hash_split(rd.from_arrow(t), "doc_id", FR, salt=7))
        assert a["split"].to_pylist() != b["split"].to_pylist()

    def test_string_ids(self, ray_session):
        import ray.data as rd
        t = pa.table({"doc_id": pa.array([f"doc-{i}" for i in
                                          range(2_000)])})
        got = hash_split(rd.from_arrow(t), "doc_id",
                         {"a": 0.5, "b": 0.5}).take_all()
        assert len(got) == 2_000

    def test_bad_fractions_raise(self, ray_session):
        import ray.data as rd
        with pytest.raises(ValueError, match="sum"):
            hash_split(rd.from_arrow(_ids(10)), "doc_id",
                       {"a": 0.5, "b": 0.1})
        with pytest.raises(ValueError, match="hash_mode"):
            hash_split(rd.from_arrow(_ids(10)), "doc_id",
                       {"a": 1.0}, hash_mode="md5")


class TestStratifiedSample:
    def _tbl(self, n=3000, seed=1):
        rng = np.random.default_rng(seed)
        return pa.table({
            "doc_id": pa.array(np.arange(n), type=pa.int64()),
            "lang": pa.array(rng.choice(["en", "fr", "de"], n).tolist()),
        })

    def _brute(self, tbl, k):
        df = tbl.to_pandas()
        df["h"] = (df.doc_id.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(2**32)
        return (df.sort_values(["lang", "h", "doc_id"])
                .groupby("lang").head(k)
                .sort_values(["lang", "h", "doc_id"])
                .reset_index(drop=True))

    @pytest.mark.parametrize("parts", [1, 7])
    def test_matches_brute_force_any_partitioning(self, ray_session, parts):
        import ray.data as rd
        from mircv_ray.ops import stratified_sample
        tbl = self._tbl()
        out = (stratified_sample(rd.from_arrow(tbl).repartition(parts),
                                 "lang", 5).to_pandas()
               .sort_values(["lang", "sample_rank"]).reset_index(drop=True))
        exp = self._brute(tbl, 5)
        assert list(out.doc_id) == list(exp.doc_id)
        assert list(out.sample_rank) == [1, 2, 3, 4, 5] * 3

    def test_small_group_keeps_all(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import stratified_sample
        tbl = pa.table({"doc_id": pa.array([1, 2, 3, 10], type=pa.int64()),
                        "lang": pa.array(["en", "en", "en", "fr"])})
        out = (stratified_sample(rd.from_arrow(tbl), "lang", 10)
               .to_pandas().sort_values(["lang", "sample_rank"]))
        assert len(out) == 4
        assert list(out[out.lang == "en"].sample_rank) == [1, 2, 3]
        assert list(out[out.lang == "fr"].sample_rank) == [1]

    def test_salt_redraws(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import stratified_sample
        tbl = self._tbl()
        a = stratified_sample(rd.from_arrow(tbl), "lang", 5,
                              salt=0).to_pandas()
        b = stratified_sample(rd.from_arrow(tbl), "lang", 5,
                              salt=99).to_pandas()
        assert set(a.doc_id) != set(b.doc_id)

    def test_crc32_mode_and_validation(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import stratified_sample
        tbl = self._tbl(500)
        out = stratified_sample(rd.from_arrow(tbl), "lang", 3,
                                hash_mode="crc32").to_pandas()
        assert len(out) == 9
        with pytest.raises(ValueError):
            stratified_sample(rd.from_arrow(tbl), "lang", 0)
        with pytest.raises(ValueError):
            stratified_sample(rd.from_arrow(tbl), "lang", 3,
                              hash_mode="nope")


class TestAlphaMixWeights:
    def _docs(self):
        rng = np.random.default_rng(7)
        srcs, texts = [], []
        for src, n, words in [("web", 200, 40), ("wiki", 50, 30),
                              ("code", 10, 25)]:
            for i in range(n):
                srcs.append(src)
                texts.append(" ".join(
                    f"w{rng.integers(0, 99)}" for _ in range(words)))
        return pa.table({"source": pa.array(srcs), "text": pa.array(texts)})

    def test_matches_numpy_reference(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import alpha_mix_weights
        tbl = self._docs()
        out = (alpha_mix_weights(rd.from_arrow(tbl).repartition(4),
                                 alpha=0.3)
               .to_pandas().sort_values("source").reset_index(drop=True))
        # brute-force reference with the same token regex
        import re
        rx = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
        counts = {}
        for s, t in zip(tbl["source"].to_pylist(), tbl["text"].to_pylist()):
            counts[s] = counts.get(s, 0) + len(rx.findall(t))
        srcs = sorted(counts)
        n = np.array([counts[s] for s in srcs], dtype=np.float64)
        share = n / n.sum()
        pw = share ** 0.3
        w = pw / pw.sum()
        assert list(out.source) == srcs
        assert list(out.n_tokens) == [counts[s] for s in srcs]
        np.testing.assert_allclose(out.share, np.round(share, 6), atol=1e-6)
        np.testing.assert_allclose(out.weight, np.round(w, 6), atol=1e-6)
        # alpha<1 up-weights the low-resource stratum
        lo = srcs[int(np.argmin(n))]
        row = out[out.source == lo].iloc[0]
        assert row.weight > row.share

    def test_alpha_one_is_identity_and_validation(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import alpha_mix_weights
        tbl = self._docs()
        out = alpha_mix_weights(rd.from_arrow(tbl), alpha=1.0).to_pandas()
        np.testing.assert_allclose(out.share, out.weight, atol=2e-6)
        with pytest.raises(ValueError):
            alpha_mix_weights(rd.from_arrow(tbl), alpha=0)


class TestImportanceResample:
    """Efraimidis-Spirakis weighted sampling with hash-derived uniforms
    — the DSIR resample step (ops/sampling.py: importance_resample)."""

    def _tbl(self, n=3000, seed=3):
        rng = np.random.default_rng(seed)
        return pa.table({
            "doc_id": pa.array(np.arange(n), type=pa.int64()),
            "log_weight": pa.array(
                np.round(rng.normal(0, 1.5, n), 4), type=pa.float64()),
        })

    @staticmethod
    def _brute(tbl, n, salt=0):
        ids = tbl["doc_id"].to_numpy().astype(np.uint64)
        h = ((ids + np.uint64(salt)) * np.uint64(2654435761)) \
            % np.uint64(2**32)
        u = (h.astype(np.float64) + 0.5) / 2**32
        lw = tbl["log_weight"].to_numpy()
        key = np.log10(-np.log(u)) - lw
        key = np.trunc(key * 1e6 + np.copysign(0.5, key)) / 1e6
        order = np.lexsort((tbl["doc_id"].to_numpy(), key))[:n]
        return tbl["doc_id"].to_numpy()[order], key[order]

    @pytest.mark.parametrize("parts", [1, 7])
    def test_matches_brute_force_any_partitioning(self, ray_session, parts):
        import ray.data as rd
        from mircv_ray.ops import importance_resample
        tbl = self._tbl()
        out = (importance_resample(rd.from_arrow(tbl).repartition(parts),
                                   50).to_pandas()
               .sort_values("sample_rank").reset_index(drop=True))
        exp_ids, exp_keys = self._brute(tbl, 50)
        assert list(out.doc_id) == list(exp_ids)
        np.testing.assert_array_equal(out.sample_key, exp_keys)
        assert list(out.sample_rank) == list(range(1, 51))

    def test_high_weights_overrepresented(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import importance_resample
        n = 4000
        lw = np.where(np.arange(n) < n // 2, 2.0, -2.0)  # w ratio 10^4
        tbl = pa.table({"doc_id": pa.array(np.arange(n), type=pa.int64()),
                        "log_weight": pa.array(lw, type=pa.float64())})
        out = importance_resample(rd.from_arrow(tbl), 200).to_pandas()
        high = (out.doc_id < n // 2).sum()
        assert high >= 195         # P(low wins a slot) ~ 1e-4 each

    def test_n_exceeding_rows_keeps_all(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import importance_resample
        tbl = self._tbl(17)
        out = (importance_resample(rd.from_arrow(tbl), 100).to_pandas()
               .sort_values("sample_rank"))
        assert len(out) == 17
        assert list(out.sample_rank) == list(range(1, 18))
        assert set(out.doc_id) == set(range(17))

    def test_salt_redraws_and_validation(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import importance_resample
        tbl = self._tbl(1000)
        a = importance_resample(rd.from_arrow(tbl), 30, salt=0).to_pandas()
        b = importance_resample(rd.from_arrow(tbl), 30, salt=5).to_pandas()
        assert set(a.doc_id) != set(b.doc_id)
        with pytest.raises(ValueError):
            importance_resample(rd.from_arrow(tbl), 0)


class TestShuffleShards:
    """shuffle_shards: deterministic global permutation + round-robin
    shard assignment (ops/sampling.py: shuffle_shards)."""

    def _tbl(self, n=2500):
        return pa.table({"doc_id": pa.array(np.arange(n), type=pa.int64()),
                         "payload": pa.array(np.arange(n) * 2)})

    @staticmethod
    def _brute(tbl, n_shards, salt=0):
        ids = tbl["doc_id"].to_numpy().astype(np.uint64)
        h = ((ids + np.uint64(salt)) * np.uint64(2654435761)) \
            % np.uint64(2**32)
        order = np.lexsort((tbl["doc_id"].to_numpy(), h.astype(np.int64)))
        rank = np.empty(len(ids), dtype=np.int64)
        rank[order] = np.arange(1, len(ids) + 1)
        return rank, (rank - 1) % n_shards

    @pytest.mark.parametrize("parts", [1, 9])
    def test_matches_brute_force(self, ray_session, parts):
        import ray.data as rd
        from mircv_ray.ops import shuffle_shards
        tbl = self._tbl()
        out = (shuffle_shards(rd.from_arrow(tbl).repartition(parts), 8)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        rank, shard = self._brute(tbl, 8)
        assert list(out.shuffle_rank) == list(rank)
        assert list(out.shard) == list(shard)
        # payload rides along untouched
        assert list(out.payload) == list(tbl["payload"].to_numpy())

    def test_shards_balanced_and_cover(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import shuffle_shards
        out = shuffle_shards(rd.from_arrow(self._tbl(1001)), 4).to_pandas()
        counts = out.shard.value_counts()
        assert set(counts.index) == {0, 1, 2, 3}
        assert counts.max() - counts.min() <= 1
        assert sorted(out.shuffle_rank) == list(range(1, 1002))

    def test_salt_reshuffles_and_validation(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import shuffle_shards
        tbl = self._tbl(600)
        a = (shuffle_shards(rd.from_arrow(tbl), 4, salt=0).to_pandas()
             .sort_values("doc_id"))
        b = (shuffle_shards(rd.from_arrow(tbl), 4, salt=3).to_pandas()
             .sort_values("doc_id"))
        assert list(a.shuffle_rank) != list(b.shuffle_rank)
        with pytest.raises(ValueError):
            shuffle_shards(rd.from_arrow(tbl), 0)


class TestTemperatureMixSample:
    def _docs(self, seed=5):
        rng = np.random.default_rng(seed)
        sources = (["web"] * 300 + ["books"] * 60 + ["code"] * 25
                   + ["wiki"] * 8)
        ids = rng.permutation(len(sources))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "source": pa.array(sources),
        })

    def _brute(self, tbl, total, T, salt=0):
        import collections
        rows = list(zip(tbl["doc_id"].to_pylist(),
                        tbl["source"].to_pylist()))
        n = collections.Counter(s for _, s in rows)
        srcs = sorted(n)
        w = {s: n[s] ** (1.0 / T) for s in srcs}
        W = sum(w[s] for s in srcs)
        exact = {s: total * w[s] / W for s in srcs}
        base = {s: int(np.floor(exact[s])) for s in srcs}
        rem = total - sum(base.values())
        for s in sorted(srcs, key=lambda s: (-(exact[s] - np.floor(
                exact[s])), s))[:max(rem, 0)]:
            base[s] += 1
        target = {s: min(base[s], n[s]) for s in srcs}
        out = set()
        for s in srcs:
            sids = sorted((d for d, src in rows if src == s),
                          key=lambda d: ((d * 2654435761) % 2**32, d))
            for rank, d in enumerate(sids[:target[s]], 1):
                out.add((d, s, rank))
        return out, target

    @pytest.mark.parametrize("total,T", [(100, 2.0), (50, 1.0),
                                         (380, 5.0), (500, 2.0)])
    def test_matches_brute_force(self, ray_session, total, T):
        import ray.data as rd
        from mircv_ray.ops import temperature_mix_sample
        tbl = self._docs()
        got_t = temperature_mix_sample(
            rd.from_arrow(tbl).repartition(5), total, temperature=T) \
            .to_pandas()
        got = set(zip(got_t.doc_id, got_t.source, got_t.sample_rank))
        exp, target = self._brute(tbl, total, T)
        assert got == exp
        # T>1 up-weights the small sources vs proportional share
        if T > 1 and total <= 380:
            share = {s: target[s] / max(total, 1) for s in target}
            assert share.get("wiki", 0) >= 8 / 393 - 1e-9

    def test_total_exceeds_corpus_and_zero(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import temperature_mix_sample
        tbl = self._docs()
        full = temperature_mix_sample(rd.from_arrow(tbl), 10_000,
                                      temperature=3.0).to_pandas()
        assert len(full) == tbl.num_rows          # everything capped
        empty = temperature_mix_sample(rd.from_arrow(tbl), 0)
        assert empty.count() == 0

    def test_validation(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import temperature_mix_sample
        tbl = self._docs()
        with pytest.raises(ValueError, match="temperature"):
            temperature_mix_sample(rd.from_arrow(tbl), 10, temperature=0)
        with pytest.raises(ValueError, match="total_docs"):
            temperature_mix_sample(rd.from_arrow(tbl), -1)
