"""CLI twins of the reference binaries (tools/): lmplz, build_binary,
query, filter — end-to-end through their main() entry points."""

from __future__ import annotations

import io
import os

import numpy as np
import pytest

LM_SMALL = "/root/reference/test_data/arpa/lm_small.arpa"
SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_build_binary_and_query_roundtrip(tmp_path):
    from kenlm_rs_spark.lm.model import NGramModel
    from kenlm_rs_spark.tools.build_binary import main as bb
    from kenlm_rs_spark.tools.query import main as q

    probing = str(tmp_path / "p.bin")
    trie = str(tmp_path / "t.bin")
    qat = str(tmp_path / "qat.bin")
    bb(["probing", LM_SMALL, probing])
    bb(["trie", LM_SMALL, trie])
    bb(["-q", "8", "-a", "64", "trie", LM_SMALL, qat])

    ref = NGramModel.load(LM_SMALL)
    expect = ref.score_sentence(["a", "b"], True, True)
    for path in (probing, trie):
        got = NGramModel.load(path).score_sentence(["a", "b"], True, True)
        assert np.float32(got) == np.float32(expect), path

    out = io.StringIO()
    q([probing, "--sentences", "a b"], stdout=out)
    text = out.getvalue()
    assert "Total:" in text and "Perplexity including OOVs:" in text
    # the reported per-sentence total matches the model's fold
    total_line = [l for l in text.splitlines() if "Total:" in l][0]
    got_total = float(total_line.split("Total:")[1].split()[0])
    assert got_total == pytest.approx(expect, abs=5e-7)


def test_query_flags(tmp_path):
    from kenlm_rs_spark.tools.query import main as q

    out = io.StringIO()
    q([LM_SMALL, "-b", "-n", "--sentences", "a b"], stdout=out)
    from kenlm_rs_spark.lm.model import NGramModel

    ref = NGramModel.load(LM_SMALL)
    expect = ref.score_sentence(["a", "b"], False, False)
    total_line = [l for l in out.getvalue().splitlines() if "Total:" in l][0]
    assert float(total_line.split("Total:")[1].split()[0]) == pytest.approx(
        expect, abs=5e-7
    )


def test_lmplz_cli(tmp_path, spark):
    from kenlm_rs_spark.builder.lmplz import estimate_arpa
    from kenlm_rs_spark.tools.lmplz import expand_prune, main as lmplz

    assert expand_prune([0, 1], 4) == [0, 1, 1, 1]
    assert expand_prune([], 3) is None

    txt = tmp_path / "corpus.txt"
    txt.write_text("a b c\nb c d\na b d\nc a b\n" * 5)
    out = str(tmp_path / "cli.arpa")
    lmplz(["-o", "2", "--text", str(txt), "--arpa", out,
           "--prune", "0", "1", "--master", "local[4]"])
    df = spark.read.text(str(txt)).withColumnRenamed("value", "text")
    expect = estimate_arpa(df, order=2, prune_thresholds=[0, 1])
    assert open(out).read() == expect


def test_filter_cli(tmp_path):
    from kenlm_rs_spark.lm.arpa import read_arpa
    from kenlm_rs_spark.tools.filter import main as fmain

    out = str(tmp_path / "f.arpa")
    fmain(["single", "--model", LM_SMALL, "--words", "a b c",
           "--output", out, "--master", "local[4]"])
    filtered = read_arpa(out)
    full = read_arpa(LM_SMALL)
    assert sum(filtered.counts) < sum(full.counts)
    allowed = {"a", "b", "c", "<s>", "</s>", "<unk>"}
    for recs in filtered.backoffs:
        for r in recs:
            assert set(r.ngram) <= allowed
    for r in filtered.no_backoff:
        assert set(r.ngram) <= allowed

    # copy mode: parse -> print roundtrip parses back with identical counts
    cp = str(tmp_path / "copy.arpa")
    fmain(["copy", "--model", LM_SMALL, "--output", cp])
    assert read_arpa(cp).counts == full.counts


def test_sql_udf_registration(spark):
    """spark.sql users can call the Python-model kernels directly."""
    from kenlm_rs_spark.lm.model import NGramModel
    from kenlm_rs_spark.pipeline.langid import default_langid
    from kenlm_rs_spark.spark.scoring import register_sql_udfs

    bc = spark.sparkContext.broadcast(NGramModel.load(LM_SMALL))
    bc_lid = spark.sparkContext.broadcast(default_langid())
    names = register_sql_udfs(spark, bc, bc_lid)
    assert names == ["kenlm_score", "kenlm_langid"]
    spark.createDataFrame([("a b",), ("the cat sat",)], "text string") \
        .createOrReplaceTempView("sql_udf_docs")
    rows = spark.sql(
        "SELECT kenlm_score(text).ppl AS ppl, kenlm_score(text).tokens AS t, "
        "kenlm_langid(text).lang AS lang FROM sql_udf_docs ORDER BY t"
    ).collect()
    assert len(rows) == 2 and all(r["ppl"] > 0 for r in rows)
    ref = NGramModel.load(LM_SMALL)
    assert rows[0]["ppl"] == pytest.approx(ref.perplexity(["a", "b"])[3], rel=1e-6)


def test_interpolate_cli(tmp_path):
    from kenlm_rs_spark.lm.model import NGramModel
    from kenlm_rs_spark.tools.interpolate import main as imain

    en = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "lms", "en.arpa",
    )
    de = en.replace("en.arpa", "de.arpa")
    if not (os.path.exists(en) and os.path.exists(de)):
        pytest.skip("per-lang fixtures missing")
    out = str(tmp_path / "merged.arpa")
    imain(["--models", en, de, "--weights", "0.7", "0.3", "--output", out])
    m = NGramModel.load(out)
    assert m.order >= 2
    total, tokens, oov, ppl = m.perplexity("the cat sat".split())
    assert ppl > 1.0 and total < 0


def test_count_ngrams_dump_counts_roundtrip(spark, tmp_path):
    """count_ngrams writes the reference's counts/vocab file pair
    (builder/count_ngrams_main.cc record format, null-delimited vocab);
    dump_counts reconstitutes the exact text counts; suffix order held."""
    import struct

    from kenlm_rs_spark.tools.count_ngrams import main as cmain
    from kenlm_rs_spark.tools.dump_counts import dump

    txt = tmp_path / "corpus.txt"
    txt.write_text("a b c\na b d\nb c\n")
    counts = str(tmp_path / "o2.counts")
    vocab = str(tmp_path / "o2.vocab")
    cmain(["--order", "2", "--text", str(txt), "--counts", counts,
           "--write_vocab_list", vocab])

    import io as _io

    buf = _io.StringIO()
    n = dump(counts, vocab, 2, out=buf)
    lines = buf.getvalue().strip().split("\n")
    assert n == len(lines)
    got = {tuple(l.split()[:-1]): int(l.split()[-1]) for l in lines}
    # expected full order-2 windows over <s> ... </s> padded sentences
    expect = {}
    for sent in ("a b c", "a b d", "b c"):
        toks = ["<s>"] + sent.split() + ["</s>"]
        for i in range(len(toks) - 1):
            g = (toks[i], toks[i + 1])
            expect[g] = expect.get(g, 0) + 1
    assert got == expect
    # suffix order: records sorted by reversed gram
    grams = [tuple(l.split()[:-1]) for l in lines]
    assert grams == sorted(grams, key=lambda g: tuple(reversed(g)))
    # vocab list is null-delimited and the binary records reference it
    blob = open(vocab, "rb").read()
    assert blob.endswith(b"\x00")
    words = blob.decode().split("\x00")[:-1]
    rec = struct.Struct("<2IQ")
    first = rec.unpack(open(counts, "rb").read(rec.size))
    assert words[first[0]] == grams[0][0] and words[first[1]] == grams[0][1]


def test_dump_counts_rejects_bad_ids_and_truncation(tmp_path):
    import struct

    from kenlm_rs_spark.tools.dump_counts import dump

    vocab = tmp_path / "v"
    vocab.write_bytes(b"a\x00b\x00")
    counts = tmp_path / "c"
    counts.write_bytes(struct.pack("<2IQ", 0, 7, 3))  # id 7 >= vocab size 2
    with pytest.raises(ValueError, match="Vocab ID 7"):
        dump(str(counts), str(vocab), 2)
    counts.write_bytes(struct.pack("<2IQ", 0, 1, 3) + b"\x01\x02")  # partial
    with pytest.raises(ValueError, match="complete record"):
        dump(str(counts), str(vocab), 2)


def test_fragment_cli_reference_goldens(tmp_path, capsys):
    """fragment scores null-context terminal chains; goldens are the
    reference's own left_test.cc Short/Charge expectations on test.arpa
    (-1.206319-0.3561665 for 'more loin'; p(on)+bo(on)+p(more) for
    'on more')."""
    import io

    from kenlm_rs_spark.tools.fragment import main as fmain

    arpa = "/root/reference/src/cxx/lm/test.arpa"
    if not os.path.exists(arpa):
        pytest.skip("test.arpa missing")
    out = io.StringIO()
    fmain([arpa], stdin=io.StringIO("more loin\non more\n"), stdout=out)
    got = [float(x) for x in out.getvalue().split()]
    assert got[0] == pytest.approx(-1.206319 - 0.3561665, abs=1e-4)
    assert got[1] == pytest.approx(-1.509559 - 0.4771212 - 1.206319, abs=1e-4)


def test_phrase_table_vocab_cli(spark, tmp_path):
    """Own words + targets of phrases whose source occurs in the sentence
    (reference phrase_table_vocab_main.cc semantics, sorted rendering)."""
    import io

    from kenlm_rs_spark.tools.phrase_table_vocab import main as pmain

    src = tmp_path / "src.txt"
    src.write_text("the big cat\na dog\n")
    table = (
        "big cat ||| gros chat ||| 0.5\n"
        "dog ||| chien ||| 0.2\n"
        "the big cat too long to matter here really truly ||| x ||| 0.1\n"
        "missing phrase ||| rien ||| 0.3\n"
    )
    out = io.StringIO()
    pmain([str(src)], stdin=io.StringIO(table), stdout=out)
    lines = out.getvalue().splitlines()
    assert lines[0].split() == sorted(["the", "big", "cat", "gros", "chat"])
    assert lines[1].split() == sorted(["a", "dog", "chien"])


def test_phrase_table_vocab_cli_empty_line(spark, tmp_path):
    """Empty/whitespace-only source lines must not crash subphrases()
    (F.sequence(1,0) -> descending -> F.slice start=0 threw) and must print
    an empty vocab line like the reference tool."""
    import io

    from kenlm_rs_spark.tools.phrase_table_vocab import main as pmain

    src = tmp_path / "src.txt"
    src.write_text("a dog\n\n   \nthe cat\n")
    table = "dog ||| chien ||| 0.2\n"
    out = io.StringIO()
    pmain([str(src)], stdin=io.StringIO(table), stdout=out)
    lines = out.getvalue().split("\n")[:-1]
    assert len(lines) == 4
    assert lines[0].split() == sorted(["a", "dog", "chien"])
    assert lines[1] == ""
    assert lines[2] == ""
    assert lines[3].split() == sorted(["the", "cat"])


def test_cat_compressed_cli(tmp_path, capsysbinary):
    import bz2
    import gzip
    import lzma

    from kenlm_rs_spark.tools.cat_compressed import main as cmain

    (tmp_path / "a.gz").write_bytes(gzip.compress(b"alpha\n"))
    (tmp_path / "b.bz2").write_bytes(bz2.compress(b"beta\n"))
    (tmp_path / "c.xz").write_bytes(lzma.compress(b"gamma\n"))
    (tmp_path / "d.txt").write_bytes(b"delta\n")
    cmain([str(tmp_path / n) for n in ("a.gz", "b.bz2", "c.xz", "d.txt")])
    assert capsysbinary.readouterr().out == b"alpha\nbeta\ngamma\ndelta\n"


def test_benchmark_cli_vocab_query_roundtrip(tmp_path):
    """kenlm_benchmark twin: text -> id byte stream (vocab) -> scored chain
    (query). The BOS-start / reset-at-EOS chain must equal the sum of
    per-line score_sentence(bos=True, eos=True) in f32 accumulation."""
    import io

    import numpy as np

    from kenlm_rs_spark.lm.model import NGramModel
    from kenlm_rs_spark.tools.benchmark import convert_to_bytes, query_bytes

    m = NGramModel.load(LM_SMALL)
    lines = ["a b c", "the cat", "zzz unseen words"]
    buf = io.BytesIO()
    n = convert_to_bytes(m, lines, buf, width_bits=16)
    assert n == sum(len(l.split()) + 1 for l in lines)
    total, n2 = query_bytes(m, buf.getvalue(), 16)
    assert n2 == n
    expect = np.float32(0.0)
    for l in lines:
        expect += np.float32(m.score_sentence(l.split(), True, True))
    assert total == pytest.approx(float(expect), abs=2e-4)
