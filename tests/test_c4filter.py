"""C4 cleaning filter: brute-force parity on handcrafted docs."""
import pyarrow as pa

from mircv_ray.ops import c4_line_filter


def _brute(text, min_words=5, min_kept_lines=3):
    t = text or ""
    lines = t.split("\n")
    kept = [l for l in lines
            if l.endswith((".", "!", "?", '"'))
            and len([w for w in l.replace("\t", " ").split(" ") if w])
            >= min_words
            and "javascript" not in l.lower()]
    keep = (len(kept) >= min_kept_lines
            and "lorem ipsum" not in t.lower() and "{" not in t)
    return (len(lines), len(kept), keep,
            "\n".join(kept) if keep else "")


GOOD3 = ("this line ends with five words.\n"
         "does this one end with a question mark?\n"
         "yes it certainly does end so!")

DOCS = [
    (0, GOOD3),                                          # keep
    (1, GOOD3 + "\nno terminal punctuation here at all"),  # extra dropped line
    (2, "too few sentences end well here."),             # 1 kept < 3
    (3, GOOD3 + "\nsome Lorem Ipsum boilerplate."),      # lorem -> drop
    (4, GOOD3.replace("certainly", "JavaScript still")),  # js line dropped
    (5, GOOD3 + "\nfunction f() { return 1; }"),         # brace -> drop
    (6, 'short ends well.\na quoted line with many many words"\n'
        "five words are needed here!\nanother full sentence sits here."),
    (7, ""),
    (8, None),
    (9, "tabs\tcount\tas\tword\tseparators\ttoo.\n" + GOOD3),
]


def test_c4_filter_equals_brute_force():
    batch = pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], type=pa.int64()),
        "text": pa.array([t for _, t in DOCS], type=pa.string()),
    })
    out = c4_line_filter(batch)
    for i, (_, text) in enumerate(DOCS):
        exp = _brute(text)
        got = (out["n_lines"][i].as_py(), out["n_kept_lines"][i].as_py(),
               out["keep"][i].as_py(), out["text_clean"][i].as_py())
        assert got == exp, (i, got, exp)
    # planted semantics
    keep = {out["doc_id"][i].as_py(): out["keep"][i].as_py()
            for i in range(out.num_rows)}
    assert keep[0] and keep[1] and keep[6] and keep[9]
    assert not (keep[2] or keep[3] or keep[4] or keep[5]
                or keep[7] or keep[8])
    # doc 1: the unterminated line is dropped but the doc survives
    assert out["text_clean"][1].as_py() == GOOD3


def test_c4_filter_thresholds():
    batch = pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["one two three.\nfour five six!"],
                         type=pa.string()),
    })
    out = c4_line_filter(batch, min_words=3, min_kept_lines=2)
    assert out["keep"][0].as_py()
    out2 = c4_line_filter(batch, min_words=4, min_kept_lines=2)
    assert not out2["keep"][0].as_py()
