"""Mojibake repair (ops/encoding.py): single and double encoding fixed to
a fixpoint, cp1252-specials handled, legitimate text never mangled, and
the Spark Arrow path matching the Python kernel."""

from kenlm_rs_spark.ops.encoding import (
    corrupt_utf8_py,
    fix_mojibake_py,
    repair_stats,
)


def test_single_and_double_encoding_roundtrip():
    clean = "café — don’t pay €5 “quoted” naïve"
    once = corrupt_utf8_py(clean)
    twice = corrupt_utf8_py(once)
    assert once != clean and twice != once
    assert fix_mojibake_py(once) == clean
    assert fix_mojibake_py(twice) == clean  # fixpoint reaches through both


def test_clean_text_untouched():
    for s in ["plain ascii", "café au lait", "naïve résumé", "", "Ω≈ç√"]:
        assert fix_mojibake_py(s) == s


def test_known_sequences():
    assert fix_mojibake_py("Ã©") == "é"
    assert fix_mojibake_py("â€™") == "’"
    assert fix_mojibake_py("â‚¬") == "€"
    # mixed valid-unicode + mojibake: strict whole-string rule leaves as-is
    mixed = "é plus Ã©"
    assert fix_mojibake_py(mixed) == mixed


def test_spark_path_matches_kernel(spark):
    rows = [
        (1, corrupt_utf8_py("déjà vu")),
        (2, "untouched ascii"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["repaired"], r["was_fixed"]) for r in repair_stats(df).collect()}
    assert got[1] == ("déjà vu", True)
    assert got[2] == ("untouched ascii", False)
    assert got[3] == (None, None)
