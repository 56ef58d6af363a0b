"""Tokenizer parity tests (FIXTURES.md F1 coverage rows; Parser.java:34-90)
and Porter stemmer sanity (canonical algorithm cases)."""

import pyarrow as pa
import pytest

from mircv_ray.text import Tokenizer, tokenize_text, stem
from mircv_ray.text.tokenizer import squeeze_token, java_trim
from mircv_ray.text.stopwords import load_stopwords


class TestTokenizeText:
    def test_html_strip(self):
        assert tokenize_text("<div>foo</div> bar", parse=False) == ["foo", "bar"]

    def test_punctuation(self):
        assert tokenize_text("self.value += x;", parse=False) == ["self", "value", "x"]

    def test_lowercase_and_squeeze_pdf_example(self):
        # PDF §2.1.1: "University-of-PissSa" -> university, of, pissa
        assert tokenize_text("University-of-PissSa", parse=False) == \
            ["university", "of", "pissa"]

    def test_squeeze_digit_exemption(self):
        assert squeeze_token("aaa111bbb") == "aa111bb"
        assert squeeze_token("xx1000yy") == "xx1000yy"
        assert squeeze_token("aaab") == "aab"

    def test_squeeze_short_tokens_unchanged(self):
        assert squeeze_token("aa") == "aa"
        assert tokenize_text("aaa aa", parse=False) == ["aa", "aa"]

    def test_long_token_dropped(self):
        tok = "x" * 70
        assert tokenize_text(f"keep {tok} also", parse=False) == ["keep", "also"]
        # 63 bytes is kept (< 64, Lexicon.java:22); use a run-free token so
        # the squeeze doesn't rewrite it
        t63 = ("ab" * 32)[:63]
        assert tokenize_text(t63, parse=False) == [t63]
        assert tokenize_text("ab" * 32, parse=False) == []

    def test_non_ascii_dropped_not_cleaned(self):
        assert tokenize_text("café naïve über ok", parse=False) == ["ok"]

    def test_single_space_split_with_tab(self):
        # a tab is not punctuation and not a split char; the whitespace-only
        # word survives trim as the reference's empty-token quirk
        assert tokenize_text("foo \t bar", parse=False) == ["foo", "", "bar"]
        assert tokenize_text("a\tb", parse=False) == ["a\tb"]

    def test_basic_mode_drops_empty(self):
        assert tokenize_text("foo \t bar", parse=False, squeeze=False) == ["foo", "bar"]

    def test_stopwords_and_stemming(self):
        # the/of/and are stopwords; return is NOT in the reference list
        toks = tokenize_text("the of and return", parse=True)
        assert toks == ["return"]
        assert tokenize_text("running runs runner", parse=True) == \
            ["run", "run", "runner"]

    def test_stopwords_before_stemming(self):
        # "this" is a stopword; "running" stems AFTER filtering (Parser.java:58-59)
        assert tokenize_text("this running", parse=True) == ["run"]

    def test_stopword_list_size(self):
        # 1298 logical lines (the file has no trailing newline, so `wc -l`
        # reports 1297); Java Files.lines() also yields 1298
        assert len(load_stopwords()) == 1298

    def test_java_trim(self):
        assert java_trim("\t foo\n") == "foo"
        assert java_trim("\x01bar\x1f") == "bar"
        assert java_trim(" \t ") == ""


class TestBatchTokenizer:
    @pytest.mark.parametrize("parse", [False, True])
    def test_matches_scalar_path(self, parse):
        docs = [
            "<div>foo</div> bar",
            "self.value += x;",
            "University-of-PissSa",
            "aaa111bbb xx1000yy aaa aa",
            "x" * 70 + " keep",
            "café naïve über ok",
            "foo \t bar",
            "the of and return running runs runner",
            "",
            "   ",
            "def main(args): return 0 # TODO!!!",
        ]
        tok = Tokenizer(parse=parse)
        batch = pa.table({"content": pa.array(docs)})
        out = tok(batch)
        got = out["tokens"].to_pylist()
        lens = out["doc_len"].to_pylist()
        for text, toks, dl in zip(docs, got, lens):
            expected = tokenize_text(text, parse=parse)
            assert toks == expected, text
            assert dl == len(expected)

    def test_basic_mode_matches_scalar(self):
        docs = ["foo \t bar", "Hello, World!  x", "aaa bbb"]
        tok = Tokenizer(parse=False, squeeze=False)
        out = tok(pa.table({"content": pa.array(docs)}))
        for text, toks in zip(docs, out["tokens"].to_pylist()):
            assert toks == tokenize_text(text, parse=False, squeeze=False)

    def test_memo_cache_reused(self):
        tok = Tokenizer(parse=True)
        tok(pa.table({"content": pa.array(["running jumping"])}))
        assert tok._memo["running"] == "run"
        tok(pa.table({"content": pa.array(["running again"])}))
        assert tok._memo["running"] == "run"


class TestPorter:
    # canonical algorithm behavior (tartarus reference implementation cases)
    @pytest.mark.parametrize("word,expected", [
        ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
        ("caress", "caress"), ("cats", "cat"),
        ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
        ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
        ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
        ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
        ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
        ("filing", "file"),
        ("happy", "happi"), ("sky", "sky"),
        ("relational", "relat"), ("conditional", "condit"),
        ("rational", "ration"), ("valenci", "valenc"), ("hesitanci", "hesit"),
        ("digitizer", "digit"), ("conformabli", "conform"),
        ("radicalli", "radic"), ("differentli", "differ"), ("vileli", "vile"),
        ("analogousli", "analog"), ("vietnamization", "vietnam"),
        ("predication", "predic"), ("operator", "oper"),
        ("feudalism", "feudal"), ("decisiveness", "decis"),
        ("hopefulness", "hope"), ("callousness", "callous"),
        ("formaliti", "formal"), ("sensitiviti", "sensit"),
        ("sensibiliti", "sensibl"),
        ("triplicate", "triplic"), ("formative", "form"),
        ("formalize", "formal"), ("electriciti", "electr"),
        ("electrical", "electr"), ("hopeful", "hope"), ("goodness", "good"),
        ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
        ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
        ("adjustable", "adjust"), ("defensible", "defens"),
        ("irritant", "irrit"), ("replacement", "replac"),
        ("adjustment", "adjust"), ("dependent", "depend"),
        ("adoption", "adopt"), ("homologou", "homolog"),
        ("communism", "commun"), ("activate", "activ"),
        ("angulariti", "angular"), ("homologous", "homolog"),
        ("effective", "effect"), ("bowdlerize", "bowdler"),
        ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
        ("controll", "control"), ("roll", "roll"),
        # departures in the C reference implementation
        ("archaeologi", "archaeolog"),
        # <= 2 chars unchanged
        ("is", "is"), ("a", "a"),
    ])
    def test_known(self, word, expected):
        assert stem(word) == expected
