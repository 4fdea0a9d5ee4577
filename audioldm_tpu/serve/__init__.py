from audioldm_tpu.serve.daemon import GenParams, Microbatcher, make_server
from audioldm_tpu.serve.engine import AdapterBank, ServeEngine

__all__ = ["AdapterBank", "GenParams", "Microbatcher", "ServeEngine", "make_server"]
