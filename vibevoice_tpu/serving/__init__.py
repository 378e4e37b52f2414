from .engine import Request, RequestHandle, ServingEngine

__all__ = ["ServingEngine", "Request", "RequestHandle"]
