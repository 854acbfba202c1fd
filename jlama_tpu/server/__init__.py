from .openai_api import OpenAIServer

__all__ = ["OpenAIServer"]
