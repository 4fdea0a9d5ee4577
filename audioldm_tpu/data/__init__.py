from audioldm_tpu.data.dataset import AudioCaptionDataset, DataPipeline
from audioldm_tpu.data import plugins_meta  # noqa: F401 — registers metadata add-ons
from audioldm_tpu.data.tokenizer import RobertaBPETokenizer, load_tokenizer

__all__ = ["AudioCaptionDataset", "DataPipeline", "RobertaBPETokenizer", "load_tokenizer"]
