from . import cbor  # noqa: F401
