"""Hybrid sentiment analysis — lexicon path + ML hook (SURVEY.md §2.G).

Behavioral spec: tsawler/prose sentiment.go (lexicon scoring
:119-231, negation window with clause-boundary cutoff :234-273, modifier
lookup :276-298, contextual rules :557-592, document aggregation
:595-682, class probabilities :756-795) and the base lexicons
(sentiment_lexicon.go:225-659). The Maxent ML path (G6-G9/G12 — feature
extractors, stable-softmax predict, combineScores, GIS trainer) lives in
``prose_spark.nlp.sentiment_ml`` and plugs in via the ``ml_model``
argument at the reference's 0.6 combine weight (sentiment.go:104-108);
without a model the ML step is a no-op, exactly like the reference's nil
classifier.

Deviation: sentence-token assignment uses the annotate kernel's proper
sanitized-span containment (annotate.py) instead of the reference's
mixed-offset-base comparison (sentiment.go:687-695), which silently drops
tokens when curly quotes shift byte offsets.

External lexicon JSON (EXTERNAL-LEXICON-GUIDE.md schema) merges over the
built-ins via ``load_lexicon(path=...)``.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field

# -- base lexicons (sentiment_lexicon.go:225-659) ---------------------------

EN_WORDS = {
    "excellent": (0.9, 0.95), "amazing": (0.85, 0.95), "wonderful": (0.85, 0.95),
    "fantastic": (0.85, 0.95), "outstanding": (0.9, 0.95), "perfect": (0.95, 0.95),
    "brilliant": (0.85, 0.95), "superb": (0.85, 0.95), "magnificent": (0.9, 0.95),
    "good": (0.6, 0.9), "great": (0.75, 0.9), "nice": (0.5, 0.85),
    "love": (0.8, 0.9), "happy": (0.7, 0.9), "beautiful": (0.75, 0.9),
    "enjoy": (0.65, 0.9), "like": (0.5, 0.85), "pleasant": (0.6, 0.9),
    "positive": (0.6, 0.9), "best": (0.85, 0.95), "better": (0.5, 0.85),
    "fun": (0.65, 0.9), "interesting": (0.5, 0.85), "awesome": (0.8, 0.9),
    "okay": (0.2, 0.7), "fine": (0.3, 0.75), "decent": (0.4, 0.8),
    "satisfactory": (0.4, 0.85),
    "terrible": (-0.9, 0.95), "awful": (-0.85, 0.95), "horrible": (-0.85, 0.95),
    "disgusting": (-0.9, 0.95), "appalling": (-0.9, 0.95), "dreadful": (-0.85, 0.95),
    "atrocious": (-0.9, 0.95), "abysmal": (-0.95, 0.95),
    "bad": (-0.6, 0.9), "hate": (-0.8, 0.9), "sad": (-0.7, 0.9),
    "ugly": (-0.75, 0.9), "disappointing": (-0.7, 0.9), "poor": (-0.65, 0.9),
    "wrong": (-0.6, 0.85), "worst": (-0.85, 0.95), "worse": (-0.5, 0.85),
    "dislike": (-0.5, 0.85), "negative": (-0.6, 0.9), "annoying": (-0.65, 0.9),
    "boring": (-0.6, 0.85), "fail": (-0.7, 0.9), "failure": (-0.75, 0.9),
    "cheap": (-0.3, 0.6), "simple": (0.1, 0.5), "long": (0.0, 0.3),
    "short": (0.0, 0.3), "fast": (0.3, 0.6), "slow": (-0.3, 0.6),
    "hard": (-0.2, 0.5), "easy": (0.3, 0.6), "complex": (-0.1, 0.4),
    "new": (0.2, 0.5), "old": (-0.2, 0.5),
}

ES_WORDS = {
    "excelente": (0.9, 0.95), "maravilloso": (0.85, 0.95),
    "fantástico": (0.85, 0.95), "bueno": (0.6, 0.9), "genial": (0.75, 0.9),
    "amor": (0.8, 0.9), "feliz": (0.7, 0.9), "hermoso": (0.75, 0.9),
    "mejor": (0.5, 0.85), "terrible": (-0.9, 0.95), "horrible": (-0.85, 0.95),
    "malo": (-0.6, 0.9), "odio": (-0.8, 0.9), "triste": (-0.7, 0.9),
    "feo": (-0.75, 0.9), "decepcionante": (-0.7, 0.9), "peor": (-0.5, 0.85),
}

FR_WORDS = {
    "excellent": (0.9, 0.95), "merveilleux": (0.85, 0.95),
    "fantastique": (0.85, 0.95), "bon": (0.6, 0.9), "génial": (0.75, 0.9),
    "amour": (0.8, 0.9), "heureux": (0.7, 0.9), "beau": (0.75, 0.9),
    "meilleur": (0.5, 0.85), "terrible": (-0.9, 0.95), "horrible": (-0.85, 0.95),
    "mauvais": (-0.6, 0.9), "déteste": (-0.8, 0.9), "triste": (-0.7, 0.9),
    "laid": (-0.75, 0.9), "décevant": (-0.7, 0.9), "pire": (-0.5, 0.85),
}

DE_WORDS = {
    "ausgezeichnet": (0.9, 0.95), "wunderbar": (0.85, 0.95),
    "fantastisch": (0.85, 0.95), "gut": (0.6, 0.9), "großartig": (0.75, 0.9),
    "liebe": (0.8, 0.9), "glücklich": (0.7, 0.9), "schön": (0.75, 0.9),
    "besser": (0.5, 0.85), "schrecklich": (-0.9, 0.95), "furchtbar": (-0.85, 0.95),
    "schlecht": (-0.6, 0.9), "hasse": (-0.8, 0.9), "traurig": (-0.7, 0.9),
    "hässlich": (-0.75, 0.9), "enttäuschend": (-0.7, 0.9), "schlechter": (-0.5, 0.85),
}

JA_WORDS = {
    "良い": (0.6, 0.9), "いい": (0.6, 0.9), "素晴らしい": (0.85, 0.95),
    "すごい": (0.75, 0.9), "大好き": (0.8, 0.9), "嬉しい": (0.7, 0.9),
    "美しい": (0.75, 0.9), "完璧": (0.9, 0.95), "最高": (0.85, 0.95),
    "楽しい": (0.7, 0.9), "悪い": (-0.6, 0.9), "ひどい": (-0.8, 0.9),
    "嫌い": (-0.7, 0.9), "悲しい": (-0.7, 0.9), "つまらない": (-0.6, 0.85),
    "最悪": (-0.85, 0.95), "残念": (-0.6, 0.85), "怖い": (-0.65, 0.9),
}

EN_MODIFIERS = {
    "very": 0.3, "extremely": 0.5, "absolutely": 0.5, "totally": 0.4,
    "really": 0.3, "so": 0.3, "quite": 0.2, "incredibly": 0.5,
    "remarkably": 0.4, "particularly": 0.3, "especially": 0.3, "super": 0.4,
    "utterly": 0.5, "completely": 0.4, "thoroughly": 0.4,
    "slightly": -0.3, "somewhat": -0.3, "rather": -0.2, "fairly": -0.1,
    "marginally": -0.4, "barely": -0.5, "hardly": -0.5, "scarcely": -0.5,
    "a bit": -0.2, "a little": -0.2, "kind of": -0.3, "sort of": -0.3,
}

EN_NEGATIONS = {
    "not", "no", "never", "neither", "nor", "cannot", "can't", "won't",
    "don't", "doesn't", "didn't", "isn't", "aren't", "wasn't", "weren't",
    "haven't", "hasn't", "hadn't", "shouldn't", "wouldn't", "couldn't",
    "nothing", "nobody", "nowhere", "none", "without",
}

_BASE = {
    "en": (EN_WORDS, EN_MODIFIERS, EN_NEGATIONS),
    "es": (ES_WORDS, {"muy": 0.3, "extremadamente": 0.5, "absolutamente": 0.5,
                      "totalmente": 0.4, "realmente": 0.3, "bastante": 0.2,
                      "súper": 0.4, "ligeramente": -0.3, "algo": -0.3,
                      "poco": -0.3, "apenas": -0.5},
           {"no", "nunca", "jamás", "nada", "nadie", "ninguno", "sin", "ni"}),
    "fr": (FR_WORDS, {"très": 0.3, "extrêmement": 0.5, "absolument": 0.5,
                      "totalement": 0.4, "vraiment": 0.3, "assez": 0.2,
                      "super": 0.4, "légèrement": -0.3, "quelque peu": -0.3,
                      "peu": -0.3, "à peine": -0.5},
           {"ne", "pas", "non", "jamais", "rien", "personne", "aucun", "sans"}),
    "de": (DE_WORDS, {"sehr": 0.3, "extrem": 0.5, "absolut": 0.5, "total": 0.4,
                      "wirklich": 0.3, "ziemlich": 0.2, "super": 0.4,
                      "leicht": -0.3, "etwas": -0.3, "wenig": -0.3, "kaum": -0.5},
           {"nicht", "kein", "keine", "nie", "niemals", "nichts", "niemand",
            "ohne"}),
    "ja": (JA_WORDS, {"とても": 0.3, "すごく": 0.4, "非常に": 0.5, "本当に": 0.3,
                      "かなり": 0.2, "めちゃくちゃ": 0.5, "超": 0.4, "完全に": 0.5,
                      "少し": -0.3, "ちょっと": -0.3, "やや": -0.2, "わずかに": -0.4,
                      "あまり": -0.4},
           {"ない", "ません", "なし", "決して", "全然", "絶対"}),
}

CLASSES = ("strong_positive", "positive", "neutral", "negative",
           "strong_negative")
_CLAUSE_BOUNDARIES = {",", ";", ":", ".", "!", "?", "but", "however",
                      "although"}


@dataclass
class SentimentConfig:
    use_lexicon: bool = True
    use_context: bool = True
    use_ml: bool = True  # DefaultSentimentConfig (sentiment.go:30); no-op
    # without a trained model, exactly like the reference's nil classifier
    min_confidence: float = 0.5
    negation_window: int = 3


@dataclass
class Lexicon:
    words: dict = field(default_factory=dict)  # word -> (sentiment, conf)
    modifiers: dict = field(default_factory=dict)
    negations: set = field(default_factory=set)

    def sentiment(self, word: str) -> float:
        e = self.words.get(word) or self.words.get(word.lower())
        return e[0] if e else 0.0

    def confidence(self, word: str) -> float:
        e = self.words.get(word) or self.words.get(word.lower())
        return e[1] if e else 0.0

    def is_negation(self, word: str) -> bool:
        return word in self.negations or word.lower() in self.negations

    def modifier(self, word: str) -> float:
        return self.modifiers.get(word) or self.modifiers.get(word.lower(), 0.0)

    # -- mutation API (sentiment_lexicon.go:724-751) -------------------------

    def add_custom_word(self, word: str, sentiment: float,
                        confidence: float) -> None:
        """Add/override a domain-specific word (AddCustomWord)."""
        self.words[word.lower()] = (sentiment, confidence)

    def add_custom_modifier(self, word: str, strength: float) -> None:
        self.modifiers[word.lower()] = strength

    def add_custom_negation(self, word: str) -> None:
        self.negations.add(word.lower())

    def has_word(self, word: str) -> bool:
        return word.lower() in self.words or word in self.words

    def size(self) -> int:
        return len(self.words)


# languageToJSONKey (sentiment_lexicon.go:130-145): external lexicon
# files key languages by full name
_LANG_JSON_KEYS = {"en": "english", "es": "spanish", "fr": "french",
                   "de": "german", "ja": "japanese"}


def load_lexicon(lang: str = "en", path: str | None = None) -> Lexicon:
    """Built-in lexicon, optionally merged with an external JSON file in
    the reference's documented schema (EXTERNAL-LEXICON-GUIDE.md /
    sentiment_lexicon.go:29-57): languages keyed by full name
    ("english"), words/positive/negative as WordEntry lists, modifiers as
    {word, factor} lists, intensifiers/diminishers as plain word lists
    merged at the reference's fixed factors 1.5 / 0.5
    (mergeLanguageData:186-196 — a quirk: far stronger than any built-in
    modifier). Legacy dict-shaped sections and bare "en" keys are also
    accepted."""
    words, mods, negs = _BASE.get(lang, _BASE["en"])
    lex = Lexicon(dict(words), dict(mods), set(negs))
    if path:
        ext = json.loads(open(path, encoding="utf-8").read())
        langs = ext.get("languages") or {}
        sect = langs.get(_LANG_JSON_KEYS.get(lang, lang)) \
            or langs.get(lang) or {}

        def word_entries(section, default_sent):
            entries = sect.get(section) or []
            if isinstance(entries, dict):  # legacy {word: {...}} form
                entries = [{"word": w, **(e if isinstance(e, dict) else {})}
                           for w, e in entries.items()]
            for e in entries:
                if isinstance(e, str):  # legacy bare-word form
                    yield e, default_sent, 0.8
                else:
                    yield (e["word"],
                           float(e.get("sentiment", default_sent)),
                           float(e.get("confidence", 0.8)))

        # mergeLanguageData (sentiment_lexicon.go:149-203): words,
        # positive and negative all merge with their OWN entry values
        for section, default in (("words", 0.0), ("positive", 0.6),
                                 ("negative", -0.6)):
            for w, s, c in word_entries(section, default):
                lex.words[w.lower()] = (s, c)
        modifiers = sect.get("modifiers") or []
        if isinstance(modifiers, dict):  # legacy
            for w, v in modifiers.items():
                lex.modifiers[w.lower()] = float(v)
        else:
            for e in modifiers:
                lex.modifiers[e["word"].lower()] = float(e["factor"])
        for section, factor in (("intensifiers", 1.5),
                                ("diminishers", 0.5)):
            entries = sect.get(section) or []
            if isinstance(entries, dict):  # legacy {word: factor}
                for w, v in entries.items():
                    lex.modifiers[w.lower()] = float(v)
            else:
                for w in entries:
                    lex.modifiers[w.lower()] = factor
        for w in sect.get("negations") or []:
            lex.negations.add(w.lower())
    return lex


def _is_content_word(text: str, tag: str) -> bool:
    # sentiment.go:698-718
    if len(text) <= 1:
        return False
    if tag:
        return tag.startswith(("NN", "VB", "JJ", "RB"))
    return any(c.isalpha() for c in text)


def _check_negation(tokens, i: int, lex: Lexicon, window: int) -> bool:
    # sentiment.go:234-273
    start = max(0, i - window)
    for j in range(start, i):
        t = tokens[j]["text"]
        lower = t.lower()
        if (lex.is_negation(t) or t in ("n't", "not") or "n't" in lower
                or lex.is_negation(lower)):
            for k in range(j + 1, i):
                if tokens[k]["text"].lower() in _CLAUSE_BOUNDARIES:
                    return False
            return True
    return False


def _apply_modifiers(base: float, tokens, i: int, lex: Lexicon) -> float:
    # sentiment.go:276-298 — first modifier within the previous 2 tokens
    if i == 0 or base == 0:
        return base
    for j in range(max(0, i - 2), i):
        m = lex.modifier(tokens[j]["text"])
        if m != 0:
            return base * (1 + m)
    return base


def _class_prob(polarity: float, intensity: float, cls: str) -> float:
    # sentiment.go:756-795
    center, spread = {
        "strong_positive": (0.8, 0.2), "positive": (0.4, 0.3),
        "neutral": (0.0, 0.2), "negative": (-0.4, 0.3),
        "strong_negative": (-0.8, 0.2),
    }[cls]
    d = abs(polarity - center)
    prob = math.exp(-d * d / (2 * spread * spread))
    if cls in ("strong_positive", "strong_negative"):
        prob *= intensity
    elif cls == "neutral":
        prob *= 1 - intensity
    return min(1.0, max(0.0, prob))


def _classify_polarity(polarity: float, intensity: float) -> str:
    # sentiment.go:737-753
    if abs(polarity) < 0.1:
        return "neutral"
    if polarity > 0:
        if intensity > 0.6 and polarity > 0.5:
            return "strong_positive"
        return "positive"
    if intensity > 0.6 and polarity < -0.5:
        return "strong_negative"
    return "negative"


def analyze_sentence_tokens(tokens, lex: Lexicon,
                            cfg: SentimentConfig = SentimentConfig(),
                            ml_model=None) -> dict:
    """One sentence's tokens (dicts with text/tag) -> sentiment score.
    Faithful port of AnalyzeSentence (sentiment.go:91-116): lexicon
    scoring (weight 0.4 via combineScores' empty-side pass-through), then
    the Maxent ML path at weight 0.6 when a trained ``ml_model``
    (nlp.sentiment_ml.MaxentSentiment) is supplied, then contextual
    rules on the combined score."""
    score = None
    pos_words: list[float] = []
    neg_words: list[float] = []
    if cfg.use_lexicon:
        score, pos_words, neg_words = _analyze_lexicon(tokens, lex, cfg)
    if cfg.use_ml and ml_model is not None:
        from prose_spark.nlp.sentiment_ml import (
            combine_scores,
            predict_sentence_score,
        )

        ml = predict_sentence_score(ml_model, [t["text"] for t in tokens])
        score = combine_scores(score, ml, 0.6)
    if score is None:
        score = {
            "polarity": 0.0, "intensity": 0.0, "confidence": 0.0,
            "dominant": "neutral", "scores": {c: 0.0 for c in CLASSES},
        }
    if cfg.use_context:
        # mixed-sentiment + question-mark damping (sentiment.go:557-592)
        if pos_words and neg_words:
            ps = sum(abs(w) for w in pos_words)
            ns = sum(abs(w) for w in neg_words)
            if min(ps, ns) / max(ps, ns) > 0.7:
                score["dominant"] = "mixed"
                score["confidence"] *= 0.8
        if any(t["text"] == "?" for t in tokens):
            score["confidence"] *= 0.9
            score["intensity"] *= 0.9
    return score


def _analyze_lexicon(tokens, lex: Lexicon,
                     cfg: SentimentConfig) -> tuple[dict, list, list]:
    """Lexicon scoring (analyzeLexicon, sentiment.go:119-231); returns
    (score, positive contributions, negative contributions)."""
    pos_score = neg_score = 0.0
    word_count = 0
    pos_words = []
    neg_words = []
    for i, tok in enumerate(tokens):
        if not _is_content_word(tok["text"], tok.get("tag", "")):
            continue
        negated = _check_negation(tokens, i, lex, cfg.negation_window)
        sentiment = lex.sentiment(tok["text"])
        modified = _apply_modifiers(sentiment, tokens, i, lex)
        if negated:
            modified = -modified * 0.5  # reversal weakens (sentiment.go:147)
        if modified != 0:
            if modified > 0:
                pos_score += modified
                pos_words.append(modified)
            else:
                neg_score += abs(modified)
                neg_words.append(modified)
            word_count += 1

    if word_count == 0:
        return (
            {
                "polarity": 0.0, "intensity": 0.0, "confidence": 0.0,
                "dominant": "neutral", "scores": {c: 0.0 for c in CLASSES},
            },
            pos_words,
            neg_words,
        )

    pos_score /= word_count
    neg_score /= word_count
    if pos_score == 0 and neg_score == 0:
        polarity = 0.0
    elif neg_score == 0:
        polarity = min(1.0, pos_score * 1.5)
    elif pos_score == 0:
        polarity = max(-1.0, -neg_score * 1.5)
    else:
        polarity = (pos_score - neg_score) / (pos_score + neg_score)
    intensity = min(1.0, max(pos_score, neg_score) * 1.5)
    coverage = word_count / len(tokens)
    confidence = min(1.0, coverage * 2) * 0.7  # max 0.7 lexicon-only

    score = {
        "polarity": polarity,
        "intensity": intensity,
        "confidence": confidence,
        "dominant": _classify_polarity(polarity, intensity),
        "scores": {c: _class_prob(polarity, intensity, c) for c in CLASSES},
    }
    return score, pos_words, neg_words


def aggregate_sentiments(sentence_scores: list[dict]) -> dict:
    """Confidence-weighted document aggregation (sentiment.go:595-682)."""
    if not sentence_scores:
        return {
            "polarity": 0.0, "intensity": 0.0, "confidence": 0.0,
            "dominant": "neutral", "scores": {c: 0.0 for c in CLASSES},
        }
    weights = sum(s["confidence"] for s in sentence_scores) or 1.0
    polarity = sum(s["polarity"] * s["confidence"] for s in sentence_scores) / weights
    intensity = sum(s["intensity"] * s["confidence"] for s in sentence_scores) / weights

    agg = {}
    for c in CLASSES:
        tp = tw = 0.0
        for s in sentence_scores:
            w = s["confidence"] or 1.0 / len(sentence_scores)
            tp += s["scores"].get(c, 0.0) * w
            tw += w
        agg[c] = tp / tw if tw > 0 else 0.0
    dominant = "neutral"
    max_prob = 0.0
    for c in CLASSES:
        if agg[c] > max_prob:
            max_prob = agg[c]
            dominant = c
    return {
        "polarity": polarity, "intensity": intensity, "confidence": max_prob,
        "dominant": dominant, "scores": agg,
    }


_LEX_CACHE: dict[str, Lexicon] = {}


def analyze_document(text: str, lang: str = "en",
                     cfg: SentimentConfig = SentimentConfig(),
                     ml_model=None) -> dict:
    """Full-document sentiment: annotate (segment/tokenize/tag) then
    per-sentence hybrid (lexicon + optional Maxent ML) scoring,
    aggregated (AnalyzeDocument, sentiment.go:76-88)."""
    from prose_spark.operators.annotate import AnnotateConfig, annotate_document

    lex = _LEX_CACHE.get(lang)
    if lex is None:
        lex = _LEX_CACHE[lang] = load_lexicon(lang)

    sents, tokens, _ = annotate_document(
        text, AnnotateConfig(segment=True, tag=True, extract=False)
    )
    if not sents:
        return aggregate_sentiments([])
    by_sent: dict[int, list] = {}
    for t in tokens:
        if t["sent_idx"] >= 0:
            by_sent.setdefault(t["sent_idx"], []).append(t)
    scores = [
        analyze_sentence_tokens(by_sent.get(i, []), lex, cfg, ml_model)
        for i in range(len(sents))
    ]
    return aggregate_sentiments(scores)
