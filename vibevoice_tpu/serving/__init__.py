from .engine import EngineStats, Request, RequestHandle, ServingEngine

__all__ = ["ServingEngine", "Request", "RequestHandle", "EngineStats"]
