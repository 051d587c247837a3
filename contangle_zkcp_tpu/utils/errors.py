class ZkcpError(Exception):
    """Base error for the framework."""


class SerializationError(ZkcpError):
    pass


class ProofError(ZkcpError):
    pass


class ProtocolError(ZkcpError):
    pass
