"""Train and embed the default ORB vocabulary.

The reference ships its .gbow inside the binary via FileResource
(GSLAM/GSLAM/core/FileResource.h:9-111) so BoW loop detection and
appearance relocalization work on install. This script reproduces that:
ORB descriptors are extracted from a spread of synthetic aerial-style
textures (the detector's actual descriptor statistics, not random bits),
a small hierarchical k-means vocabulary is trained (k=10, L=3 -> 1000
words — enough for loop detection on survey-scale maps), and the .gbow is
embedded as pislamfusion_tpu/resources/orb_vocab.py.

Usage: python scripts/train_default_vocab.py [out.gbow]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from pislamfusion_tpu.core import resource
from pislamfusion_tpu.ops import image as im
from pislamfusion_tpu.ops.features import orb
from pislamfusion_tpu.ops.vocabulary import Vocabulary


def real_views(rng, n, size=(480, 640)):
    """Augmented views of the real aerial photograph
    (tests/data/aerial_npu.png — see tests/test_real_texture.py for its
    provenance): random crop window, rotation, scale, brightness/contrast
    jitter, blur. Gives the vocabulary the descriptor statistics of real
    nadir imagery (building edges, road lattice, canopy) instead of
    procedural speckle."""
    from PIL import Image
    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "aerial_npu.png")
    img = Image.open(p).convert("L")
    a = np.asarray(img, np.float32)
    a = np.concatenate([a, a[:, ::-1]], 1)
    a = np.concatenate([a, a[::-1]], 0)            # seamless mirror tile
    big = np.asarray(Image.fromarray(a.astype(np.uint8)).resize(
        (1280, 1280), Image.LANCZOS), np.float32)
    h, w = size
    for _ in range(n):
        ang = float(rng.uniform(0, 360))
        view = Image.fromarray(big.astype(np.uint8)).rotate(
            ang, Image.BILINEAR)
        s = float(rng.uniform(0.7, 1.3))
        vw, vh = int(w / s), int(h / s)
        x0 = rng.integers(160, 1280 - vw - 160)
        y0 = rng.integers(160, 1280 - vh - 160)
        crop = view.crop((x0, y0, x0 + vw, y0 + vh)).resize(
            (w, h), Image.BILINEAR)
        v = np.asarray(crop, np.float32)
        v = (v - 127.5) * float(rng.uniform(0.8, 1.2)) + 127.5 \
            + float(rng.uniform(-20, 20))
        sigma = float(rng.uniform(0.4, 1.2))
        v = np.asarray(im.gaussian_blur(
            jnp.asarray(np.clip(v, 0, 255))[..., None], sigma))[..., 0]
        yield v


def textures(rng, n):
    """Training views: mostly augmented REAL aerial photography (see
    real_views) with a synthetic minority for texture-family diversity
    (fields/stripes/gradients the one photo lacks)."""
    n_real = (2 * n) // 3
    for v in real_views(rng, n_real):
        yield v
    for v in _synth_textures(rng, n - n_real):
        yield v


def _synth_textures(rng, n):
    """Aerial-ish texture family: blobs, stripes, gradients, speckle."""
    for i in range(n):
        base = np.full((480, 640), 120.0, np.float32)
        base += rng.normal(0, 10, base.shape)
        for _ in range(rng.integers(150, 400)):
            y, x = rng.integers(0, 440), rng.integers(0, 600)
            h, w = rng.integers(4, 40, 2)
            base[y:y + h, x:x + w] = rng.uniform(20, 235)
        if i % 3 == 0:   # field stripes
            period = rng.integers(8, 40)
            phase = np.arange(640) % period < period // 2
            base += np.where(phase[None, :], 15.0, -15.0)
        if i % 4 == 0:   # illumination gradient
            base += np.linspace(-25, 25, 640)[None, :]
        sigma = float(rng.uniform(0.6, 1.8))
        yield np.asarray(im.gaussian_blur(
            jnp.asarray(np.clip(base, 0, 255))[..., None], sigma))[..., 0]


def main():
    out_gbow = sys.argv[1] if len(sys.argv) > 1 else "/tmp/orb_default.gbow"
    rng = np.random.default_rng(42)
    params = orb.OrbParams(n_features=500, n_levels=4)
    descs = []
    for i, tex in enumerate(textures(rng, 24)):
        feats = orb.orb_detect(jnp.asarray(tex), params)
        valid = np.asarray(feats["valid"])
        d = np.asarray(feats["desc"])[valid]
        descs.append(np.asarray(orb.pack_bits(jnp.asarray(d))))
        print(f"texture {i}: {valid.sum()} descriptors")
    D = np.concatenate(descs, 0)
    print(f"training on {len(D)} descriptors...")
    voc = Vocabulary.create(D, k=10, L=3)
    print(f"vocabulary: {voc.size()} words, {len(voc.node_parent)} nodes")
    voc.save(out_gbow)
    out_py = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "pislamfusion_tpu", "resources",
        "orb_vocab.py")
    os.makedirs(os.path.dirname(out_py), exist_ok=True)
    resource.generate_module(out_gbow, "orb_default.gbow", out_py)
    print(f"embedded -> {out_py} ({os.path.getsize(out_py)} bytes)")


if __name__ == "__main__":
    main()
