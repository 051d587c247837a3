from . import serialize
from .errors import ZkcpError, SerializationError, ProofError, ProtocolError
