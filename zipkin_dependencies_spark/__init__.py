"""zipkin_dependencies_spark — a PySpark-native engine with the query and
data-processing capabilities of openzipkin/zipkin-dependencies, plus
LLM-data-pipeline extension operators (dedup, similarity search, multimodal
columns, text analysis), every operator designed for 100 TB scale.

Blueprint: SURVEY.md (reference citations are file:line into /root/reference).
"""

from .linker import DependencyLinker, Span, link_trace
from .plans import DependencyLinksJob, JobConfig
from .session import get_spark

__all__ = [
    "DependencyLinker",
    "Span",
    "link_trace",
    "DependencyLinksJob",
    "JobConfig",
    "get_spark",
]
