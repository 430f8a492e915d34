from .beam_search import beam_search, generate, tile_encoder_out
from .trie import DenseTrie

__all__ = ["beam_search", "generate", "tile_encoder_out", "DenseTrie"]
