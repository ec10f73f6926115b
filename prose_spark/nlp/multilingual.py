"""Multilingual helpers (SURVEY.md §2.H).

Behavioral spec: tsawler/prose multilingual.go — stop-word/char-evidence
language detection (:74-123), per-language normalization (:331-375), and
per-language stop-word sets (:214-328). Detection affects only metadata:
like the reference, the English tokenizer/tagger/NER run regardless, and
the KG layer gates triple extraction on lang='en'.
"""

from __future__ import annotations

import unicodedata

from prose_spark.operators.textstats import STOPWORDS, _detect_lang_one

SUPPORTED = ("en", "es", "fr", "de", "ja")


def detect_language(text: str) -> tuple[str, float]:
    """-> (lang, confidence); short texts default to ('en', 0.5)
    (multilingual.go:74-123)."""
    return _detect_lang_one(text)


def stop_words(lang: str) -> frozenset[str]:
    return frozenset(STOPWORDS.get(lang, STOPWORDS["en"]))


def is_stop_word(word: str, lang: str = "en") -> bool:
    return word.lower() in STOPWORDS.get(lang, STOPWORDS["en"])


_DE_MAP = {"ß": "ss", "ä": "ae", "ö": "oe", "ü": "ue",
           "Ä": "Ae", "Ö": "Oe", "Ü": "Ue"}


def normalize_text(text: str, lang: str) -> str:
    """Language-aware normalization (multilingual.go:331-375):
    de: ß->ss, umlauts->digraphs; fr/es: strip accents; else unchanged."""
    if lang == "de":
        return "".join(_DE_MAP.get(ch, ch) for ch in text)
    if lang in ("fr", "es"):
        decomposed = unicodedata.normalize("NFD", text)
        return "".join(ch for ch in decomposed
                       if unicodedata.category(ch) != "Mn")
    return text


def annotate_multilingual(text: str, cfg=None):
    """NewMultilingualDocument equivalent (multilingual.go:403-423):
    detect -> annotate; returns (lang, confidence, sentences, tokens,
    entities)."""
    from prose_spark.operators.annotate import AnnotateConfig, annotate_document

    lang, conf = detect_language(text)
    sents, toks, ents = annotate_document(text, cfg or AnnotateConfig())
    return lang, conf, sents, toks, ents
