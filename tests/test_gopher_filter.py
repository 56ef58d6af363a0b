"""Gopher quality rules: brute-force parity on handcrafted docs."""
import re

import numpy as np
import pyarrow as pa


def _brute(docs, **kw):
    stops = ("the", "be", "to", "of", "and", "that", "have", "with")
    out = {}
    for d, txt in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
        nw = len(toks)
        mwl = round(sum(map(len, toks)) / nw, 4) if nw else 0.0
        ar = round(sum(1 for t in toks if re.search("[a-z]", t)) / nw,
                   4) if nw else 0.0
        nc = len(txt)
        sym = (txt.count("#")
               + (nc - len(txt.replace("...", ""))) / 3.0)
        sr = round(sym / nc, 4) if nc else 0.0
        ns = len({s for s in stops if s in toks})
        keep = (kw["min_words"] <= nw <= kw["max_words"]
                and kw["min_mean_word_len"] <= mwl
                <= kw["max_mean_word_len"]
                and sr <= kw["max_symbol_ratio"]
                and ar >= kw["min_alpha_word_ratio"]
                and ns >= kw["min_stopwords"])
        out[d] = (nw, mwl, ar, sr, ns, keep)
    return out


def test_gopher_filter_equals_brute_force(ray_session):
    import ray.data as rd
    from mircv_ray.ops import gopher_filter

    good = ("the quick brown fox jumps over and over to the barn of "
            "hay that we have filled with straw bales") * 2
    docs = [
        (0, good),                                   # passes everything
        (1, "short the of"),                         # too few words
        (2, "no stopwords here just code tokens " + "word " * 20),
        (3, good + " ###### ##### ##### #### ### ... ... ..."),  # symbols
        (4, ("a b c d e f g h i j " * 5) + "the of"),  # mean len < 3
        (5, "123 456 789 " * 20 + "the of and to"),  # alpha ratio low
        (6, ""),                                     # empty
    ]
    kw = dict(min_words=10, max_words=1000, min_mean_word_len=3.0,
              max_mean_word_len=10.0, max_symbol_ratio=0.05,
              min_alpha_word_ratio=0.8, min_stopwords=2)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
        "text": pa.array([t for _, t in docs]),
    })).repartition(3)
    got = gopher_filter(ds, **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = _brute(docs, **kw)
    for _, r in got.iterrows():
        nw, mwl, ar, sr, ns, keep = exp[r.doc_id]
        assert r.n_words == nw, r.doc_id
        assert abs(r.mean_word_len - mwl) < 1e-9, r.doc_id
        assert abs(r.alpha_word_ratio - ar) < 1e-9, r.doc_id
        assert abs(r.symbol_ratio - sr) < 1e-9, r.doc_id
        assert r.n_stopwords_present == ns, r.doc_id
        assert bool(r.keep) == keep, r.doc_id
    z = got.set_index("doc_id")
    assert bool(z.loc[0].keep)
    assert not z.loc[[1, 2, 3, 4, 5, 6]].keep.any()
