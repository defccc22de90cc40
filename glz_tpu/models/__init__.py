"""Codec model registry — the framework's "model families".

Reference parity map (SURVEY.md §2):
  canonical_byte -> C4 CanonicalHuffEncoder<unsigned char> + 3 decoders
  huffword       -> C5 CanonicalHuffEncoder<std::string> (dual dicts)
  normal_tree    -> C3 NormalHuffEncoder (legacy explicit tree)
"""

from glz_tpu import config as cfg

REGISTRY = {
    "canonical_byte": cfg.MODE_BYTE,
    "huffword": cfg.MODE_HUFFWORD,
    "normal_tree": cfg.MODE_NORMAL_TREE,
}


def by_name(name: str) -> int:
    if name not in REGISTRY:
        raise KeyError(f"unknown codec model {name!r}; have {sorted(REGISTRY)}")
    return REGISTRY[name]
