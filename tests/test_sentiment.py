"""Sentiment tests — port of reference sentiment_test.go behavioral cases
(lexicon path; the reference suite itself runs with UseML=false)."""

import json

import pytest

from prose_spark.nlp.sentiment import (
    analyze_document,
    load_lexicon,
)


POLARITY_CASES = [
    ("I love this product!", 0.8, 0.2, "strong positive"),
    ("This is terrible.", -0.8, 0.2, "strong negative"),
    ("It's okay.", 0.2, 0.3, "mildly positive"),
    ("Not bad at all.", 0.4, 0.3, "negation of negative"),
    ("I don't like it.", -0.4, 0.3, "negation of positive"),
    ("This movie is absolutely fantastic!", 0.85, 0.2, "intensified positive"),
    ("The service was slightly disappointing.", -0.6, 0.4, "diminished negative"),
    ("I really hate this!", -0.8, 0.2, "intensified negative"),
    ("This is good but not great.", 0.3, 0.3, "mixed"),
    ("", 0.0, 0.1, "empty"),
]


@pytest.mark.parametrize("text,expected,delta,desc", POLARITY_CASES,
                         ids=[c[3] for c in POLARITY_CASES])
def test_polarity(text, expected, delta, desc):
    s = analyze_document(text)
    assert abs(s["polarity"] - expected) <= delta, s


INTENSITY_CASES = [
    ("This is absolutely amazing!", 0.7),
    ("It's very very bad.", 0.6),
    ("Slightly disappointing.", 0.3),
    ("TERRIBLE!!!", 0.7),
    ("good", 0.5),
    ("This is the worst thing ever!", 0.7),
    ("Perfect! Absolutely perfect!", 0.8),
]


@pytest.mark.parametrize("text,min_intensity", INTENSITY_CASES)
def test_intensity(text, min_intensity):
    assert analyze_document(text)["intensity"] >= min_intensity


NEGATION_PAIRS = [
    ("This is good.", "This is not good."),
    ("I like it.", "I don't like it."),
    ("Happy with the service.", "Not happy with the service."),
    ("The food is excellent.", "The food isn't excellent."),
    ("I love this.", "I never loved this."),
]


@pytest.mark.parametrize("positive,negated", NEGATION_PAIRS)
def test_negation_flips_or_reduces(positive, negated):
    pos = analyze_document(positive)["polarity"]
    neg = analyze_document(negated)["polarity"]
    assert not (pos > 0.1 and neg > 0)


def test_modifier_ordering():
    base = analyze_document("This is good.")["polarity"]
    intensified = analyze_document("This is very good.")["polarity"]
    diminished = analyze_document("This is slightly good.")["polarity"]
    very = analyze_document("This is extremely good.")["polarity"]
    assert intensified >= base
    assert diminished <= base
    assert very >= intensified


CLASS_CASES = [
    # (reference TestSentimentClasses — its own Mixed case is not asserted
    # there either: document aggregation derives dominant from the class
    # probs, which have no mixed bucket)
    ("This is absolutely perfect!", "positive"),
    ("Good product.", "positive"),
    ("Not good.", "negative"),
    ("Absolutely terrible!", "negative"),
]


@pytest.mark.parametrize("text,direction", CLASS_CASES)
def test_class_direction(text, direction):
    s = analyze_document(text)
    got_positive = s["dominant"] in ("positive", "strong_positive")
    assert got_positive == (direction == "positive"), s


def test_mixed_at_sentence_level():
    from prose_spark.nlp.sentiment import analyze_sentence_tokens, load_lexicon
    from prose_spark.operators.annotate import AnnotateConfig, annotate_document

    _, toks, _ = annotate_document(
        "The food was good but the service was bad.",
        AnnotateConfig(extract=False),
    )
    s = analyze_sentence_tokens(toks, load_lexicon("en"))
    assert s["dominant"] == "mixed"


def test_question_damps_confidence():
    plain = analyze_document("This is good.")
    q = analyze_document("This is good?")
    assert q["confidence"] <= plain["confidence"]


def test_external_lexicon(tmp_path):
    ext = {
        "languages": {
            "en": {
                "words": {"spark": {"sentiment": 0.9, "confidence": 0.9}},
                "negative": ["shuffle"],
                "modifiers": {"hugely": 0.5},
                "negations": ["nope"],
            }
        }
    }
    p = tmp_path / "lex.json"
    p.write_text(json.dumps(ext))
    lex = load_lexicon("en", str(p))
    assert lex.sentiment("spark") == 0.9
    assert lex.sentiment("shuffle") == -0.6
    assert lex.modifier("hugely") == 0.5
    assert lex.is_negation("nope")
    # built-ins still present
    assert lex.sentiment("good") == 0.6


def test_multilingual_lexicons():
    assert analyze_document("Esto es excelente y maravilloso.", lang="es")["polarity"] > 0.4
    assert analyze_document("C'est un film horrible et mauvais.", lang="fr")["polarity"] < -0.4
    assert analyze_document("Das ist wunderbar und ausgezeichnet.", lang="de")["polarity"] > 0.4


def test_multilingual_detection_and_normalize():
    from prose_spark.nlp.multilingual import (
        detect_language,
        is_stop_word,
        normalize_text,
    )

    lang, conf = detect_language(
        "the quick brown fox is in the house and it was not there"
    )
    assert lang == "en" and conf > 0
    assert detect_language("short")[0] == "en"  # <10 chars default
    assert normalize_text("Straße über", "de") == "Strasse ueber"
    assert normalize_text("café déjà", "fr") == "cafe deja"
    assert normalize_text("mañana", "es") == "manana"
    assert is_stop_word("the", "en") and is_stop_word("der", "de")


def test_stopword_membership_suite():
    """Port of multilingual_test.go:7-133 (TestGetStopWords sample
    membership, TestStopWordsLibraryIntegration, multilingual-document
    stop-word access)."""
    from prose_spark.nlp.multilingual import (
        detect_language,
        is_stop_word,
        stop_words,
    )

    samples = {
        "en": ["the", "a", "an", "and", "or", "but", "in", "on", "at",
               "to", "for"],
        "es": ["el", "la", "de", "que", "y", "a", "en", "un", "por"],
        "fr": ["le", "de", "un", "et", "être", "avoir", "que", "pour",
               "dans"],
        "de": ["der", "die", "und", "in", "den", "von", "zu", "das",
               "mit"],
        "ja": ["の", "は", "を", "に", "が", "と", "で", "て"],
    }
    for lang, words in samples.items():
        sw = stop_words(lang)
        assert sw, lang
        for w in words:
            assert w in sw, (lang, w)
    # library-integration cases (multilingual_test.go:100-133)
    for lang, stop, nonstop in [
        ("en", "the", "programming"),
        ("es", "el", "programación"),
        ("fr", "le", "programmation"),
        ("de", "der", "programmierung"),
    ]:
        assert is_stop_word(stop, lang)
        assert not is_stop_word(nonstop, lang)
    # multilingual documents can access their language's stop words
    for text, want in [
        ("The quick brown fox jumps over the lazy dog", "en"),
        ("El rápido zorro marrón salta sobre el perro perezoso", "es"),
        ("Der schnelle braune Fuchs springt über den faulen Hund", "de"),
    ]:
        lang, _ = detect_language(text)
        assert lang == want, (text, lang)
        assert stop_words(lang)


def test_external_lexicon_reference_schema(tmp_path):
    """The reference's documented JSON schema (EXTERNAL-LEXICON-GUIDE.md):
    full-name language keys, WordEntry lists, {word, factor} modifiers,
    intensifiers/diminishers at the fixed 1.5/0.5 merge factors
    (sentiment_lexicon.go:149-203)."""
    ext = {
        "languages": {
            "english": {
                "words": [{"word": "Fantastic", "sentiment": 0.8,
                           "confidence": 0.9}],
                "positive": [{"word": "uptime", "sentiment": 0.55,
                              "confidence": 0.7}],
                "negative": [{"word": "downtime", "sentiment": -0.65,
                              "confidence": 0.7}],
                "modifiers": [{"word": "massively", "factor": 0.45}],
                "intensifiers": ["ultra"],
                "diminishers": ["mildly"],
                "negations": ["nuh-uh"],
            }
        }
    }
    p = tmp_path / "ref_lex.json"
    p.write_text(json.dumps(ext))
    lex = load_lexicon("en", str(p))
    assert lex.sentiment("fantastic") == 0.8
    assert lex.confidence("fantastic") == 0.9
    assert lex.sentiment("uptime") == 0.55
    assert lex.sentiment("downtime") == -0.65
    assert lex.modifier("massively") == 0.45
    assert lex.modifier("ultra") == 1.5  # reference's fixed merge factor
    assert lex.modifier("mildly") == 0.5
    assert lex.is_negation("nuh-uh")
    # built-ins still present
    assert lex.sentiment("good") == 0.6


def test_external_feature_words_for_rich_extractor(tmp_path):
    from prose_spark.nlp.sentiment_ml import (
        extract_rich_features,
        load_external_feature_words,
    )

    ext = {
        "languages": {
            "english": {
                "positive": [{"word": "Zorptastic", "sentiment": 0.9}],
                "negations": ["nixnix"],
            }
        }
    }
    p = tmp_path / "ext.json"
    p.write_text(json.dumps(ext))
    words = load_external_feature_words(str(p), "en")
    assert "zorptastic" in words["positive"]
    toks = [{"text": "Zorptastic", "tag": "JJ"},
            {"text": "nixnix", "tag": "RB"}]
    f = extract_rich_features(toks, "en", external=words)
    assert f["has_positive"] == 1.0
    assert f["has_negation"] == 1.0
    # without the external lists neither fires
    f0 = extract_rich_features(toks, "en")
    assert "has_positive" not in f0 and "has_negation" not in f0
