from .backend import ChatBackend, MockChatBackend, OpenAIChatBackend
from .pipeline import LLMMapResult, llm_map
from .spec import JobSpec, JobSpecError

__all__ = [
    "ChatBackend",
    "MockChatBackend",
    "OpenAIChatBackend",
    "JobSpec",
    "JobSpecError",
    "llm_map",
    "LLMMapResult",
]
