from .wire import MessageBody, DistributionType, decode_message
from .server import PPXSimulatorServer

__all__ = [
    "MessageBody",
    "DistributionType",
    "decode_message",
    "PPXSimulatorServer",
]
