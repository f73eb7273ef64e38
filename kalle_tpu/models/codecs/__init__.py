from . import discriminators, melvae, oobleck, sigmavae

__all__ = ["discriminators", "melvae", "oobleck", "sigmavae"]
