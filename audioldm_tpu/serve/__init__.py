from audioldm_tpu.serve.engine import AdapterBank, ServeEngine

__all__ = ["AdapterBank", "ServeEngine"]
