"""Multi-head clothing / hairstyle attribute classifiers.

Reference parity: ``DetectClothing`` / ``DetectHairStyle``
(old/clothing_detection.py:212-260, old/hairstyle_detection.py:56-120) run
the StreetStyle-derived "newsanchor" classifier: one shared CNN trunk over
a 299×299 ImageNet-normalized crop, with one softmax head per clothing /
hair attribute, returning ``(scores, features)`` where ``scores`` is the
per-attribute logits list. The reference does NOT contain that trunk — it
downloads the model *definition* from a third-party GitHub at run time
(clothing_detection.py:13-14), so an exact architecture twin is out of any
offline repo's scope. What IS reference behavior — the attribute
vocabularies, the 299×299 ImageNet-normalized input, the multi-head
argmax protocol, and ``(scores, features)`` — is reproduced exactly; the
trunk is a compact inception-style tower and is swappable via the model
registry for hosts that fetch the original definition.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

INPUT_SIZE = 299  # transforms.Resize((299, 299)) (clothing_detection.py:217)
IMAGENET_MEAN = (0.485, 0.456, 0.406)  # clothing_detection.py:220
IMAGENET_STD = (0.229, 0.224, 0.225)

# Exact attribute vocabularies (old/clothing_detection.py:17-88).
CLOTHING_ATTRIBUTES: Tuple[Tuple[str, Tuple[str, ...]], ...] = (
    ("Clothing pattern",
     ("solid", "graphics", "striped", "floral", "plaid", "spotted")),
    ("Major color",
     ("black", "white", "more color", "blue", "gray", "red", "pink",
      "green", "yellow", "brown", "purple", "orange", "cyan", "dark blue")),
    ("Wearing necktie", ("necktie no", "necktie yes")),
    ("Collar presence", ("collar no", "collar yes")),
    ("Wearing scarf", ("scarf no", "scarf yes")),
    ("Sleeve length", ("long sleeve", "short sleeve", "no sleeve")),
    ("Neckline shape", ("round", "folded", "v-shape")),
    ("Clothing category",
     ("shirt", "outerwear", "t-shirt", "dress", "tank top", "suit",
      "sweater")),
    ("Wearing jacket?", ("jacket no", "jacket yes")),
    ("Wearing hat?", ("hat no", "hat yes")),
    ("Wearing glasses?", ("glasses no", "glasses yes")),
    ("Multiple layers?", ("one layer", "more layer")),
    ("Necktie color",
     ("black", "white", "more color", "blue", "gray", "red", "pink",
      "green", "yellow", "brown", "purple", "orange", "cyan", "dark blue")),
    ("Necktie pattern", ("solid", "striped", "spotted")),
    ("Hair color", ("black", "white", "blond", "brown", "gray")),
    ("Hair length", ("long", "medium", "short", "bald")),
)

# Exact vocabularies (old/hairstyle_detection.py:17-30).
HAIRSTYLE_ATTRIBUTES: Tuple[Tuple[str, Tuple[str, ...]], ...] = (
    ("Hair color 3", ("black", "white", "blond")),
    ("Hair color 5", ("black", "white", "blond", "brown", "gray")),
    ("Hair length", ("long", "medium", "short", "bald")),
)


class _InceptionBlock(nn.Module):
    """Parallel 1×1 / 3×3 / pooled-1×1 branches, concatenated — the
    inception mixing pattern at a compact width (MXU-friendly: all branch
    convs are dense channel contractions)."""

    width: int

    @nn.compact
    def __call__(self, x):
        w = self.width
        b1 = nn.relu(nn.Conv(w, (1, 1), name="b1")(x))
        b3 = nn.relu(nn.Conv(w // 2, (1, 1), name="b3r")(x))
        b3 = nn.relu(nn.Conv(w, (3, 3), name="b3")(b3))
        bp = nn.avg_pool(x, (3, 3), (1, 1), padding="SAME")
        bp = nn.relu(nn.Conv(w // 2, (1, 1), name="bp")(bp))
        return jnp.concatenate([b1, b3, bp], axis=-1)


class MultiHeadAttributeNet(nn.Module):
    """Shared trunk + one logits head per attribute.

    __call__ returns ``(scores, features)`` exactly like the reference's
    fetched classifier (clothing_detection.py:246: ``scores, features =
    self.model(var)``): ``scores`` is a list of [B, n_values] logits, one
    per attribute, and ``features`` the pooled trunk embedding."""

    head_sizes: Sequence[int]

    @nn.compact
    def __call__(self, x, with_heads: bool = True):
        # [B, 299, 299, 3] ImageNet-normalized
        x = nn.relu(nn.Conv(32, (3, 3), (2, 2), name="stem1")(x))
        x = nn.relu(nn.Conv(64, (3, 3), (2, 2), name="stem2")(x))
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")
        x = _InceptionBlock(64, name="mix1")(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")
        x = _InceptionBlock(96, name="mix2")(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")
        x = _InceptionBlock(128, name="mix3")(x)
        feat = jnp.mean(x, axis=(1, 2))  # global average pool
        if not with_heads:
            # trunk-only forward: the expert-parallel path computes the
            # heads from stack_head_params outside (each chip only its own)
            return feat
        scores = [
            nn.Dense(k, name=f"head{i}")(feat)
            for i, k in enumerate(self.head_sizes)
        ]
        return scores, feat


def _net(attributes) -> MultiHeadAttributeNet:
    return MultiHeadAttributeNet(
        head_sizes=tuple(len(vals) for _, vals in attributes))


def normalize(crops_f32: jnp.ndarray) -> jnp.ndarray:
    """[B, 299, 299, 3] in [0, 255] -> ImageNet-normalized (the reference's
    ToTensor + Normalize transform, clothing_detection.py:217-221)."""
    x = crops_f32 / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def init_params_clothing(rng: jax.Array) -> Dict[str, Any]:
    x = jnp.zeros((1, INPUT_SIZE, INPUT_SIZE, 3), jnp.float32)
    return _net(CLOTHING_ATTRIBUTES).init(rng, x)


def init_params_hairstyle(rng: jax.Array) -> Dict[str, Any]:
    x = jnp.zeros((1, INPUT_SIZE, INPUT_SIZE, 3), jnp.float32)
    return _net(HAIRSTYLE_ATTRIBUTES).init(rng, x)


def stack_head_params(variables, attributes):
    """Per-attribute Dense heads stacked on a leading 'expert' axis —
    kernels [E, F, Kmax] / biases [E, Kmax], zero-padded to the widest
    vocabulary, plus a validity mask [E, Kmax] (True = real class). The
    layout ``heads_apply_sharded`` shards one-group-per-chip (the
    VERDICT-r4 'experts = attribute heads' wiring)."""
    params = variables["params"]
    sizes = [len(vals) for _, vals in attributes]
    kmax = max(sizes)
    ws, bs, mask = [], [], []
    for i, k in enumerate(sizes):
        w = jnp.asarray(params[f"head{i}"]["kernel"])  # [F, k]
        b = jnp.asarray(params[f"head{i}"]["bias"])    # [k]
        ws.append(jnp.pad(w, ((0, 0), (0, kmax - k))))
        bs.append(jnp.pad(b, (0, kmax - k)))
        mask.append(jnp.arange(kmax) < k)
    return jnp.stack(ws), jnp.stack(bs), jnp.stack(mask)


def heads_apply_sharded(stacked, feat: jnp.ndarray, mesh,
                        axis: str = "expert") -> jnp.ndarray:
    """Head logits [B, E, Kmax] with the E head-weight groups sharded
    one-per-chip over ``mesh[axis]`` (each chip computes ONLY its own
    heads' matmuls; the output resharding is the sole ICI traffic).
    Trace-safe: composes into an enclosing jit like the other parallel
    helpers; numerically identical to the per-head Dense layers."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    import jax

    w, b, _ = stacked
    pspec = (P(axis), P(axis))
    placed_w = jax.lax.with_sharding_constraint(
        w, NamedSharding(mesh, P(axis)))
    placed_b = jax.lax.with_sharding_constraint(
        b, NamedSharding(mesh, P(axis)))

    def body(wl, bl, f):
        return jnp.einsum("bf,efk->bek", f, wl) + bl[None]

    return shard_map(body, mesh=mesh,
                     in_specs=pspec + (P(),),
                     out_specs=P(None, axis), check_rep=False)(
        placed_w, placed_b, feat)


def _predict_multihead(variables, crops_f32, attributes, mesh):
    """argmax-per-attribute [B, E] int32; ``mesh`` (an 'expert' mesh or
    None) selects the head-sharded path — same predictions either way
    (padded classes are masked to -inf before the argmax)."""
    if mesh is None:
        scores, _ = _net(attributes).apply(variables, normalize(crops_f32))
        return jnp.stack([jnp.argmax(s, axis=-1) for s in scores],
                         axis=1).astype(jnp.int32)
    feat = _net(attributes).apply(variables, normalize(crops_f32),
                                  with_heads=False)
    stacked = stack_head_params(variables, attributes)
    logits = heads_apply_sharded(stacked, feat, mesh)   # [B, E, Kmax]
    masked = jnp.where(stacked[2][None], logits, -jnp.inf)
    return jnp.argmax(masked, axis=-1).astype(jnp.int32)


def predict_clothing(variables, crops_f32: jnp.ndarray,
                     mesh=None) -> jnp.ndarray:
    """[B, 299, 299, 3] raw [0,255] -> [B, 16] int32 argmax per attribute
    (the reference's per-head torch.max, clothing_detection.py:249-253).
    ``mesh``: an 'expert' mesh shards the 16 attribute heads one-group-
    per-chip (PerfParams(expert_shards=N) via DetectClothing)."""
    return _predict_multihead(variables, crops_f32, CLOTHING_ATTRIBUTES,
                              mesh)


def predict_hairstyle(variables, crops_f32: jnp.ndarray,
                      mesh=None) -> jnp.ndarray:
    return _predict_multihead(variables, crops_f32, HAIRSTYLE_ATTRIBUTES,
                              mesh)
