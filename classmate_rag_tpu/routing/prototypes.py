"""Subject-prototype seed phrases and translation-intent triggers.

Same mechanism as the reference (rag/routing/prototypes.py:18-73): each
route's seeds are embedded as queries, averaged, and L2-normalized into a
prototype vector; the "default" route deliberately has none and wins by
elimination. Phrases are tuning data — edit freely.
"""

from __future__ import annotations

from typing import Dict, List

from classmate_rag_tpu.routing.types import Route

SUBJECT_PROTOTYPES: Dict[Route, List[str]] = {
    "math": [
        "compute the derivative and the integral of this function",
        "prove the theorem by induction on n",
        "find the eigenvalues of this matrix",
        "solve the system of linear equations",
        "what is the probability distribution and its variance",
        "factor the quadratic polynomial",
        "evaluate the limit of the sequence",
        "solve the differential equation with initial conditions",
    ],
    "code": [
        "fix the bug in this Python function",
        "write a C++ implementation of the algorithm",
        "add unit tests covering the edge cases",
        "explain what this stack trace means",
        "refactor the class to be more readable",
        "traverse a binary tree with a linked list queue",
        "analyze the big O time complexity",
        "write a regex to parse this string in JavaScript",
    ],
    "translation": [
        "translate this text from English to Italian",
        "traduci questa frase in inglese",
        "what does this Italian expression mean in English",
        "come si dice questa parola in italiano",
        "provide a faithful translation of the paragraph",
        "translate the following sentences",
        "conjugate the Italian verb in the right tense",
    ],
    "default": [],
}

TRANSLATION_INTENT_KEYWORDS: tuple[str, ...] = (
    "translate",
    "translation",
    "traduci",
    "traduce",
    "traduzione",
    "traduco",
    "translator",
    "in english",
    "in italian",
    "in italiano",
    "in inglese",
    "how do you say",
    "how to say",
    "come si dice",
    "what does",
)
