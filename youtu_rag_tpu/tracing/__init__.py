from .tracer import Span, Tracer, get_tracer, setup_tracing, DBTracingProcessor

__all__ = ["DBTracingProcessor", "Span", "Tracer", "get_tracer", "setup_tracing"]
