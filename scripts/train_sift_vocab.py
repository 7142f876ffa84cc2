"""Train and embed the default SIFT vocabulary.

Twin of scripts/train_default_vocab.py for the reference's DEFAULT
detector (Default.cfg:2-9 selects Sift): the reference ships a .gbow so
`LoopDetector?=BoW` works on install regardless of detector; without a
float vocabulary our SIFT configs silently degraded to the GPS distance
detector. SIFT descriptors are 128-dim float32, so the vocabulary stores
raw f32 centers and the device descent scores squared-L2
(ops/vocabulary.py `_descend` float branch) — the same tree shapes as the
binary ORB vocab (k=10, L=3 -> 1000 words).

Usage: python scripts/train_sift_vocab.py [out.gbow]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from pislamfusion_tpu.core import resource
from pislamfusion_tpu.ops.features import sift
from train_default_vocab import textures
from pislamfusion_tpu.ops.vocabulary import Vocabulary


def main():
    out_gbow = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sift_default.gbow"
    rng = np.random.default_rng(43)
    params = sift.SiftParams(n_features=400, n_octaves=4,
                             contrast_threshold=0.02)
    descs = []
    for i, tex in enumerate(textures(rng, 16)):
        feats = sift.sift_detect(jnp.asarray(tex), params)
        valid = np.asarray(feats["valid"])
        descs.append(np.asarray(feats["desc"])[valid].astype(np.float32))
        print(f"texture {i}: {valid.sum()} descriptors")
    D = np.concatenate(descs, 0)
    print(f"training on {len(D)} float descriptors...")
    voc = Vocabulary.create(D, k=10, L=3)
    print(f"vocabulary: {voc.size()} words, {len(voc.node_parent)} nodes")
    voc.save(out_gbow)
    out_py = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "pislamfusion_tpu", "resources",
        "sift_vocab.py")
    resource.generate_module(out_gbow, "sift_default.gbow", out_py)
    print(f"embedded -> {out_py} ({os.path.getsize(out_py)} bytes)")


if __name__ == "__main__":
    main()
