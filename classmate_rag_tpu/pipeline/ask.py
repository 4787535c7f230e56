"""Ask pipeline: retrieve → expand → prompt → (routed) generate → post.

Call-flow parity with the reference (rag/pipeline/rag.py:511-714):
retrieval with metadata filters, neighbor expansion + per-doc diversity
caps, target-language resolution (forced > configured > question
detection), 3500-char context budget, routed or legacy generation with an
"I don't know" general-answer fallback, optional translate-on-miss (legacy
path), and optional strict-citation enforcement (skipped for fallback
answers, which never saw the context).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from classmate_rag_tpu.generation import (
    build_general_messages,
    build_grounded_messages,
    enforce_citations,
    format_context_blocks,
)
from classmate_rag_tpu.generation.runner import get_runner
from classmate_rag_tpu.metadata import DocumentMetadata
from classmate_rag_tpu.pipeline.runtime import Runtime, get_runtime
from classmate_rag_tpu.retrieval import expand_with_neighbors
from classmate_rag_tpu.routing.types import ROUTES, Route, RouteDecision
from classmate_rag_tpu.routing.prompts import system_prompt_for
from classmate_rag_tpu.utils import detect_lang_tag


@dataclass
class AskResult:
    question: str
    answer: str
    language: str
    top_k: int
    sources: List[str]
    retrieved: List[Dict[str, object]]
    filters_applied: Dict[str, object]
    hybrid: bool
    route: Optional[str] = None
    route_reason: Optional[str] = None


def _looks_unknown(answer: str, lang: str) -> bool:
    a = (answer or "").strip().lower()
    if not a:
        return True
    if lang == "it":
        return "non lo so" in a or "non so" in a
    return "i don't know" in a or "i dont know" in a


def _needs_translation(answer: str, target_lang: str) -> bool:
    if not answer.strip():
        return False
    detected = detect_lang_tag(answer)
    return detected in ("en", "it") and detected != target_lang


def _translate_text(text: str, target_lang: str, runner) -> str:
    """Translate via the active runner, preserving [n] citations."""
    if not text.strip():
        return text
    if target_lang == "it":
        system = (
            "Sei un traduttore. Traduci fedelmente in italiano il seguente "
            "testo. Mantieni esattamente i riferimenti tra parentesi quadre "
            "come [1], [2]."
        )
        prompt = f"Testo da tradurre:\n{text}"
    else:
        system = (
            "You are a translator. Translate the following text faithfully "
            "into English. Preserve bracketed citations like [1], [2] "
            "exactly."
        )
        prompt = f"Text to translate:\n{text}"
    messages = [
        {"role": "system", "content": system},
        {"role": "user", "content": prompt},
    ]
    out = runner.chat(messages, temperature=0.0, top_p=1.0, max_tokens=2048)
    return out.strip() or text


def _apply_expansion_and_diversity(results, rt: Runtime):
    cfg = rt.cfg
    radius = cfg.neighbor_radius if cfg.enable_neighbor_expansion else 0
    return expand_with_neighbors(
        results, rt.catalog, radius=radius, max_per_doc=cfg.doc_diversity_cap,
    )


def ask_question(
    *,
    question: str,
    filters: DocumentMetadata,
    top_k: int = 8,
    hybrid: bool = True,
    forced_subject: Optional[str] = None,
    runtime: Optional[Runtime] = None,
) -> AskResult:
    from classmate_rag_tpu.utils.metrics import metrics

    with metrics.timer("ask"):
        return _ask_question(
            question=question, filters=filters, top_k=top_k,
            hybrid=hybrid, forced_subject=forced_subject, runtime=runtime,
        )


def retrieve_batch_for_ask(
    *,
    questions: List[str],
    filters: DocumentMetadata,
    top_k: int = 8,
    hybrid: bool = True,
    runtime: Optional[Runtime] = None,
):
    """DEVICE phase of the batched ask: ONE fused retrieval dispatch for
    all questions (they share the filter set). Returns the per-question
    result lists, already materialized on host — callers holding a device
    lock can release it before the generation tail."""
    rt = runtime or get_runtime()
    where = filters.to_dict()
    return rt.retriever.retrieve_batch(
        questions=list(questions), filters=where, top_k=int(top_k),
        hybrid=bool(hybrid),
    )


def finish_ask_batch(
    *,
    questions: List[str],
    batched,
    filters: DocumentMetadata,
    top_k: int = 8,
    hybrid: bool = True,
    forced_subject: Optional[str] = None,
    runtime: Optional[Runtime] = None,
) -> List[AskResult]:
    """HOST tail of the batched ask: expansion, prompting, generation,
    citations per question. Device-free for the extractive/llama.cpp
    runners; safe to run outside the serving device lock."""
    rt = runtime or get_runtime()
    where = filters.to_dict()
    return [
        _finish_ask(
            question=q, results=_apply_expansion_and_diversity(list(r), rt),
            filters=filters, where=where, top_k=top_k, hybrid=hybrid,
            forced_subject=forced_subject, rt=rt,
        )
        for q, r in zip(questions, batched)
    ]


def ask_question_batch(
    *,
    questions: List[str],
    filters: DocumentMetadata,
    top_k: int = 8,
    hybrid: bool = True,
    forced_subject: Optional[str] = None,
    runtime: Optional[Runtime] = None,
) -> List[AskResult]:
    """Batched ask: retrieve_batch_for_ask + finish_ask_batch in one call
    (the serving daemon invokes the phases separately so the device lock
    covers only retrieval)."""
    from classmate_rag_tpu.utils.metrics import metrics

    rt = runtime or get_runtime()
    with metrics.timer("ask_batch"):
        batched = retrieve_batch_for_ask(
            questions=questions, filters=filters, top_k=top_k,
            hybrid=hybrid, runtime=rt,
        )
        return finish_ask_batch(
            questions=questions, batched=batched, filters=filters,
            top_k=top_k, hybrid=hybrid, forced_subject=forced_subject,
            runtime=rt,
        )


def _ask_question(
    *,
    question: str,
    filters: DocumentMetadata,
    top_k: int = 8,
    hybrid: bool = True,
    forced_subject: Optional[str] = None,
    runtime: Optional[Runtime] = None,
) -> AskResult:
    rt = runtime or get_runtime()
    where = filters.to_dict()
    results = rt.retriever.retrieve(
        question=question, filters=where, top_k=int(top_k),
        hybrid=bool(hybrid),
    )
    results = _apply_expansion_and_diversity(list(results), rt)
    return _finish_ask(
        question=question, results=results, filters=filters, where=where,
        top_k=top_k, hybrid=hybrid, forced_subject=forced_subject, rt=rt,
    )


def _finish_ask(
    *,
    question: str,
    results: List[Dict[str, object]],
    filters: DocumentMetadata,
    where: Dict[str, object],
    top_k: int,
    hybrid: bool,
    forced_subject: Optional[str],
    rt: Runtime,
) -> AskResult:
    cfg = rt.cfg

    forced_lang = None
    if filters.language and filters.language.value in ("en", "it"):
        forced_lang = filters.language.value
    if forced_lang:
        target_lang = forced_lang
    else:
        default = str(cfg.default_language)
        target_lang = default if default in ("en", "it") else detect_lang_tag(question)

    context_text, provenance = format_context_blocks(
        results, max_total_chars=cfg.context_budget_chars
    )

    strict = cfg.strict_citations
    add_sources = cfg.append_sources_block
    sources_title = "Sources" if target_lang == "en" else "Fonti"

    # ---- Routed path -------------------------------------------------
    if cfg.enable_routing:
        forced_route: Optional[Route] = None
        candidate = forced_subject or filters.subject
        if isinstance(candidate, str) and candidate in ROUTES:
            forced_route = candidate  # type: ignore[assignment]

        decision: RouteDecision = rt.router.decide(
            question,
            retrieved_metas=[r.get("metadata") or {} for r in results],
            forced_subject=forced_route,
        )
        messages = [
            {"role": "system",
             "content": system_prompt_for(decision.route, language=target_lang)},
            {"role": "user",
             "content": f"Context:\n{context_text}\n\nQuestion:\n{question}\n\nAnswer:"},
        ]
        answer = rt.loader.chat(
            route=decision.route, messages=messages,
            max_tokens=cfg.route_max_tokens,
            temperature=cfg.route_temperature, top_p=cfg.route_top_p,
        ).strip()

        from_fallback = False
        if _looks_unknown(answer, target_lang):
            general = build_general_messages(question)
            if target_lang == "it":
                general[0] = {
                    "role": "system",
                    "content": "Sei un assistente generico. Rispondi alla "
                               "domanda dell'utente.",
                }
            answer = rt.loader.chat(
                route=decision.route, messages=general,
                max_tokens=cfg.route_max_tokens,
                temperature=cfg.route_temperature, top_p=cfg.route_top_p,
            ).strip()
            from_fallback = True

        if strict and not from_fallback:
            answer = enforce_citations(
                answer, provenance,
                add_sources_block=add_sources, sources_title=sources_title,
            )
        return AskResult(
            question=question, answer=answer, language=target_lang,
            top_k=int(top_k), sources=[] if from_fallback else provenance,
            retrieved=results, filters_applied=where, hybrid=bool(hybrid),
            route=decision.route, route_reason=decision.reason,
        )

    # ---- Legacy single-model path ------------------------------------
    runner = get_runner(cfg)
    messages = build_grounded_messages(
        question=question, context_text=context_text, citations_required=True
    )
    answer = runner.chat(
        messages, max_tokens=cfg.llm_max_tokens,
        temperature=cfg.llm_temperature, top_p=cfg.llm_top_p,
    ).strip()

    from_fallback = False
    if _looks_unknown(answer, target_lang):
        answer = runner.chat(build_general_messages(question)).strip()
        from_fallback = True

    if cfg.translate_on_miss and _needs_translation(answer, target_lang):
        answer = _translate_text(answer, target_lang, runner)

    if strict and not from_fallback:
        answer = enforce_citations(
            answer, provenance,
            add_sources_block=add_sources, sources_title=sources_title,
        )
    return AskResult(
        question=question, answer=answer, language=target_lang,
        top_k=int(top_k), sources=[] if from_fallback else provenance,
        retrieved=results, filters_applied=where, hybrid=bool(hybrid),
    )
