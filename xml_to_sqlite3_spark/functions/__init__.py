"""Column-expression helpers (JVM-side, codegen-friendly)."""

from .type_inference import infer_type  # noqa: F401
