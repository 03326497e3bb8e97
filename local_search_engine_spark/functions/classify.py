"""Query intent classification → retrieval weights — the deterministic
re-expression of the reference's QueryClassifier (reference
query_classifier.py:29-238) minus its external dependencies.

Mirrored semantics (SURVEY.md F17/F18):
  * intent pattern tables verbatim (query_classifier.py:66-89);
  * word/marker hits ×0.3, multi-word phrase hits ×0.5, score cap 1.0
    (query_classifier.py:205-238);
  * retrieval weight table verbatim (query_classifier.py:91-97);
  * confidence-scaled interpolation toward 0.5 when confidence < 0.5:
    w' = 0.5 + (w - 0.5) * conf (query_classifier.py:182-184);
  * per-type fusion K lives in operators.fusion.FUSION_K
    (retriever.py:417-426).

Deliberate divergences:
  * spaCy POS bonuses (query_classifier.py:220-229) are replaced by
    deterministic lexical proxies — wh-word presence for FACTUAL (+0.4),
    literal 'why' for REASONING (+0.6), a leading imperative verb from
    the PROCEDURAL verb list (+0.4); the COMPARISON amod-dependency
    bonus is dropped (needs a parser, and its markers already fire).
    A deterministic engine cannot depend on a model download;
  * spell correction is the engine's own vocabulary-based corrector
    (operators/spell.py), not SymSpell's bundled English dictionary —
    a CODE corpus vocabulary is the right dictionary here;
  * tie-break across query types with equal scores is pinned to the
    enum declaration order (the reference's max() over dict items is
    insertion-order dependent — same order, now explicit).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class QueryType(Enum):
    FACTUAL = "factual"
    REASONING = "reasoning"
    COMPARISON = "comparison"
    EXPLORATORY = "exploratory"
    PROCEDURAL = "procedural"


INTENT_PATTERNS = {
    QueryType.FACTUAL: {
        "question_words": ["what", "when", "where", "who", "which"],
        "verbs": ["is", "are", "was", "were", "does"],
        "patterns": ["define", "meaning of", "definition of"],
    },
    QueryType.REASONING: {
        "question_words": ["why", "how"],
        "verbs": ["explain", "causes", "affects", "influences", "works"],
        "patterns": ["reason for", "because", "explain", "understand"],
    },
    QueryType.COMPARISON: {
        "markers": ["compare", "versus", "vs", "difference", "better", "worse"],
        "patterns": ["compared to", "differences between", "pros and cons"],
    },
    QueryType.EXPLORATORY: {
        "verbs": ["tell", "describe", "elaborate", "discuss"],
        "patterns": ["tell me about", "what are", "information about", "learn about"],
    },
    QueryType.PROCEDURAL: {
        "markers": ["how to", "steps", "guide", "tutorial", "instructions"],
        "verbs": ["make", "create", "build", "implement", "setup", "configure"],
    },
}

RETRIEVAL_WEIGHTS = {
    QueryType.FACTUAL: {"dense": 0.2, "sparse": 0.8},
    QueryType.REASONING: {"dense": 0.75, "sparse": 0.25},
    QueryType.COMPARISON: {"dense": 0.60, "sparse": 0.40},
    QueryType.EXPLORATORY: {"dense": 0.80, "sparse": 0.20},
    QueryType.PROCEDURAL: {"dense": 0.55, "sparse": 0.45},
}

_WH = {"what", "when", "where", "who", "which", "why", "how"}


@dataclass
class QueryAnalysis:
    query_type: QueryType
    weights: dict
    confidence: float = 1.0
    features: dict = field(default_factory=dict)


def type_scores(query: str) -> dict[QueryType, float]:
    q = query.lower()
    words = q.split()
    scores: dict[QueryType, float] = {}
    for qt, pats in INTENT_PATTERNS.items():
        score = 0.0
        for key in ("question_words", "verbs", "markers"):
            if key in pats:
                score += sum(w in words for w in pats[key]) * 0.3
        if "patterns" in pats:
            score += sum(p in q for p in pats["patterns"]) * 0.5
        if qt is QueryType.FACTUAL and any(w in _WH for w in words):
            score += 0.4
        elif qt is QueryType.REASONING and "why" in words:
            score += 0.6
        elif qt is QueryType.PROCEDURAL and words and words[0] in pats["verbs"]:
            score += 0.4
        scores[qt] = min(score, 1.0)
    return scores


def analyze_query(query: str) -> QueryAnalysis:
    scores = type_scores(query)
    best_type = max(QueryType, key=lambda qt: (scores[qt], -list(QueryType).index(qt)))
    confidence = scores[best_type]
    weights = dict(RETRIEVAL_WEIGHTS[best_type])
    if confidence < 0.5:
        weights = {k: 0.5 + (w - 0.5) * confidence for k, w in weights.items()}
    return QueryAnalysis(
        query_type=best_type, weights=weights, confidence=confidence, features=scores
    )
