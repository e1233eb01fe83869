from .llm import (
    BaseChatClient,
    ChatMessage,
    ChatResponse,
    FakeChatClient,
    OpenAIChatClient,
    ToolCall,
    get_chat_client,
)
from .config import AgentConfig, ModelConfig
from .simple_agent import SimpleAgent
from .llm_agent import LLMAgent
from .factory import get_agent

__all__ = [
    "AgentConfig",
    "BaseChatClient",
    "ChatMessage",
    "ChatResponse",
    "FakeChatClient",
    "LLMAgent",
    "ModelConfig",
    "OpenAIChatClient",
    "SimpleAgent",
    "ToolCall",
    "get_agent",
    "get_chat_client",
]
