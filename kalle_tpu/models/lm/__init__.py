from . import convert, llama, llasa, losses, variants

__all__ = ["convert", "llama", "llasa", "losses", "variants"]
