from .generators import SimpleAgentGenerator, ToolGenerator

__all__ = ["SimpleAgentGenerator", "ToolGenerator"]
