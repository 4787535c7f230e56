from classmate_rag_tpu.routing.classifier import ClassificationResult, SubjectClassifier
from classmate_rag_tpu.routing.loader import StickyModelLoader
from classmate_rag_tpu.routing.prompts import system_prompt_for
from classmate_rag_tpu.routing.registry import ModelSpec, get_model_spec
from classmate_rag_tpu.routing.router import HybridRouter
from classmate_rag_tpu.routing.types import DEFAULT_ROUTE, ROUTES, Route, RouteDecision

__all__ = [
    "ClassificationResult",
    "DEFAULT_ROUTE",
    "HybridRouter",
    "ModelSpec",
    "ROUTES",
    "Route",
    "RouteDecision",
    "StickyModelLoader",
    "SubjectClassifier",
    "get_model_spec",
    "system_prompt_for",
]
