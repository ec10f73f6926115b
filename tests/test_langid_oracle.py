"""Cross-engine contract for the ta_langid DuckDB oracle (r4).

The driver gate exercises __spark_entry__._langid_oracle_sql() only on
the sf0.01 corpus, which is pure-ASCII single-space text — so the
char-hint term, the Unicode letter class, and the tab/newline word
splits are never covered there. This suite runs the SAME generated SQL
against the Python kernel (textstats._detect_lang_one — which is also
what the Spark pandas UDF executes) on a handcrafted corpus that hits
every scoring term and edge:

- accented char hints (ñ¿¡ / ßüöä / French accents / kana),
- Unicode letters under [^\\p{L}] vs str.isalpha,
- tab/newline/multi-space word splits ('\\s+' vs str.split()),
- short (<10 chars) and empty texts -> ('en', 0.5),
- score ties resolved by ascending lang order (first max),
- exact-binary conf values on the HALF_UP rounding boundary.

Conf equality is asserted at the gate's own precision: %.6f after
Spark-style HALF_UP rounding (check_oracles._norm_val formats floats at
6 decimals; pyspark F.round is decimal HALF_UP, matching DuckDB ROUND —
verified on the exact-binary 0.6640625 case from the sf0.01 corpus).
"""

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

CORPUS = [
    (0, ""),  # empty -> en/0.5
    (1, "tiny txt"),  # <10 chars -> en/0.5
    (2, "The cat and the dog are in the house and they are not alone."),
    (3, "¡Hola señor! El niño y la niña están en la casa con el perro."),
    (4, "Les enfants sont dans la maison avec le chien et le chat déjà."),
    (5, "Der Hund und die Katze sind in dem Haus mit der Tür außen."),
    (6, "これはのにはをがでてとし日本語のテキストです。"),
    (7, "word\tword\nthe  and   is\r\nto of a an"),  # mixed whitespace
    (8, "zzz qqq xxx vvv"),  # no stopwords, no known trigrams
    (9, "aaaa" * 30),  # overlapping trigram mass, no hits
    (10, "the " * 16),  # exact-binary score ratios (rounding boundary)
    (11, "piñata jalapeño ¿qué? ¡sí! über straße çà élève のが"),
]


def _spark_round6(x: float) -> str:
    return str(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def test_langid_oracle_matches_kernel_on_unicode_corpus():
    import __spark_entry__ as entrymod
    from prose_spark.operators.textstats import _detect_lang_one

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", CORPUS)
    got = con.execute(entrymod._langid_oracle_sql()).fetchall()
    assert len(got) == len(CORPUS)
    for (doc_id, text), (g_id, g_lang, g_conf) in zip(CORPUS, got):
        lang, conf = _detect_lang_one(text)
        assert g_id == doc_id
        assert g_lang == lang, (
            f"doc {doc_id}: oracle {g_lang} != kernel {lang} ({text!r})")
        assert f"{g_conf:.6f}" == _spark_round6(conf), (
            f"doc {doc_id}: oracle conf {g_conf:.6f} != "
            f"kernel {_spark_round6(conf)} ({text!r})")


def test_langid_kernel_predictions_sane():
    from prose_spark.operators.textstats import _detect_lang_one

    assert _detect_lang_one(CORPUS[2][1])[0] == "en"
    assert _detect_lang_one(CORPUS[3][1])[0] == "es"
    assert _detect_lang_one(CORPUS[4][1])[0] == "fr"
    assert _detect_lang_one(CORPUS[5][1])[0] == "de"
    assert _detect_lang_one(CORPUS[6][1])[0] == "ja"
    assert _detect_lang_one("short")[1] == 0.5


def test_langid_tie_breaks_ascending_lang_order():
    """A text with zero evidence everywhere scores 0.0 for every lang;
    the kernel's max(sorted(scores)) picks 'de' (first in ascending
    order) and the oracle's CASE chain must agree."""
    import __spark_entry__ as entrymod
    from prose_spark.operators.textstats import _detect_lang_one

    text = "zzzz qqqq 1234 %%%%"  # >=10 chars, no hits anywhere
    lang, conf = _detect_lang_one(text)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (1, ?)", [text])
    g_lang, g_conf = con.execute(
        entrymod._langid_oracle_sql()).fetchall()[0][1:]
    assert (g_lang, f"{g_conf:.6f}") == (lang, _spark_round6(conf))
