"""Per-route, per-language system prompts.

Structure parity with rag/routing/prompts.py:21-100: every grounded route
shares the citation contract (answer ONLY from the numbered context, cite
[n], reply exactly "I don't know" / "Non lo so" when the context lacks the
answer); the translation route skips it (that model only translates).
"""

from __future__ import annotations

from classmate_rag_tpu.routing.types import Route

_CONTRACT_EN = (
    "Answer ONLY from the numbered context blocks. Cite the blocks you use "
    "as [1], [2], ... next to each claim. If the context does not contain "
    "the answer, reply exactly: I don't know"
)
_CONTRACT_IT = (
    "Rispondi SOLO usando i blocchi di contesto numerati. Cita i blocchi "
    "usati come [1], [2], ... accanto a ogni affermazione. Se il contesto "
    "non contiene la risposta, rispondi esattamente: Non lo so"
)

_ROLE_EN = {
    "math": "You are a rigorous mathematics tutor. Show the key steps.",
    "code": "You are an expert programming assistant. Be precise about code.",
    "default": "You are a helpful study assistant for course materials.",
}
_ROLE_IT = {
    "math": "Sei un tutor di matematica rigoroso. Mostra i passaggi chiave.",
    "code": "Sei un assistente esperto di programmazione. Sii preciso sul codice.",
    "default": "Sei un assistente di studio per materiali dei corsi.",
}

_TRANSLATION_EN = (
    "You are a professional translator between English and Italian. "
    "Translate faithfully, preserving bracketed citations like [1] exactly. "
    "Output only the translation."
)
_TRANSLATION_IT = (
    "Sei un traduttore professionista tra inglese e italiano. Traduci "
    "fedelmente, preservando esattamente i riferimenti tra parentesi come "
    "[1]. Produci solo la traduzione."
)


def system_prompt_for(route: Route, language: str = "en") -> str:
    it = (language or "en").lower().startswith("it")
    if route == "translation":
        return _TRANSLATION_IT if it else _TRANSLATION_EN
    roles = _ROLE_IT if it else _ROLE_EN
    contract = _CONTRACT_IT if it else _CONTRACT_EN
    return f"{roles.get(route, roles['default'])} {contract}"
