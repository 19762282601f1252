"""Hardware-generation guard for measured policy constants.

Several performance policies in this framework are *measured*, not derived:
the binning-layout thresholds (render_pallas_flat.FLAT_THRESHOLD /
RESIDENT_THRESHOLD), the resident kernel's SMEM budget (1 MiB, with rank-2
minor dims padded to 128 elements), the saturating-walk gate
(render_pallas.SAT_WALK_THRESHOLD), and the depth-aware tile-height
breakpoints (tiles.tune_tile_height). All of them were swept on a TPU
**v5e** (BASELINE.md); a different TPU generation (v5p, v6e, ...) has
different SMEM/VMEM sizes and VPU/MXU ratios, so silently keeping v5e
policy there could mis-tune or even fail allocation.

This module does not re-derive the constants (that needs the sweeps); it
makes the porting hazard loud: the first time a measured policy is
consulted on a non-v5e TPU, a single warning names the constants to
re-sweep. CPU (tests / virtual meshes) is exempt -- policies there only
shape compilation, never allocation.
"""

from __future__ import annotations

import functools
import warnings

# The device kinds the policy constants were measured on. jax reports the
# v5e as "TPU v5 lite" / "tpu v5e" depending on runtime version.
MEASURED_KINDS = ("v5 lite", "v5e", "v5litepod")

_POLICY_CONSTANTS = (
    "render_pallas_flat.FLAT_THRESHOLD/RESIDENT_THRESHOLD (binning layout)",
    "render_pallas_flat._RESIDENT_SMEM_BUDGET (1 MiB v5e SMEM)",
    "render_pallas.SAT_WALK_THRESHOLD (in-loop saturation exit gate)",
    "tiles.tune_tile_height breakpoints (~2500/~5000 pairs per 32-row tile)",
)


@functools.lru_cache(maxsize=None)
def _device_kind() -> str:
    """Lowercased device kind of the default backend ("" if unknown)."""
    import jax

    try:
        return jax.devices()[0].device_kind.lower()
    except Exception:  # backend not reachable; don't block the caller
        return ""


@functools.lru_cache(maxsize=None)
def warn_if_untuned() -> bool:
    """Warn once when measured v5e policy runs on a different TPU kind.

    Returns True when the hardware matches what the constants were
    measured on (or is CPU/unknown, where they are harmless)."""
    kind = _device_kind()
    if not kind.startswith("tpu") and "tpu" not in kind:
        return True  # CPU / interpret / unknown: policies are shape-only
    if any(tag in kind for tag in MEASURED_KINDS):
        return True
    warnings.warn(
        f"performance policy constants were measured on TPU v5e but this "
        f"backend reports {kind!r}; re-sweep before trusting: "
        + "; ".join(_POLICY_CONSTANTS),
        stacklevel=3)
    return False


# --- allocation-critical budget resolution (round 5) ----------------------
#
# Two policy constants are not merely tuning knobs but ALLOCATION bounds:
# exceeding the real SMEM with the resident table fails compilation, and
# exceeding VMEM with the G-cache scratch can wedge a remote compile. They
# are resolved through this table so a port to another TPU generation has
# ONE place to supply swept values (or the env overrides below) instead of
# silently inheriting v5e numbers. Unknown TPU kinds fall back to the v5e
# budgets -- conservative for every announced generation (none ships less
# on-core memory than v5e's 1 MiB SMEM / ~16 MiB VMEM) -- and
# warn_if_untuned keeps the re-sweep debt loud.
#
# Env overrides (bytes): GS2D_SMEM_TABLE_BUDGET, GS2D_GCACHE_BUDGET.

_V5E_BUDGETS = {
    # Measured on this bench's v5e (BASELINE.md): SMEM 1 MiB (exact sizes
    # from the Mosaic allocator error), VMEM ~16 MiB/core. Budgets leave
    # headroom for counts/scalars (SMEM) and the fused kernels' other
    # blocks + double buffering (VMEM).
    "smem_table": 800 * 1024,
    "gcache_vmem": 12 * 1024 * 1024,
}

_GEN_BUDGETS = {
    # kind-substring -> budget dict; extend when swept on new hardware.
    "v5 lite": _V5E_BUDGETS,
    "v5e": _V5E_BUDGETS,
    "v5litepod": _V5E_BUDGETS,
}

_ENV_KEYS = {"smem_table": "GS2D_SMEM_TABLE_BUDGET",
             "gcache_vmem": "GS2D_GCACHE_BUDGET"}


def resolve_budget(name: str, measured_default: int) -> int:
    """Per-generation value of an allocation-critical budget (bytes).

    ``measured_default`` is the caller's module-level v5e constant; it is
    returned unchanged on the measured v5e and on CPU/interpret backends
    (budgets only shape compilation there), so in-process A/B overrides of
    those constants (scripts/ab_gcache.py) keep working. Other TPU kinds
    resolve through _GEN_BUDGETS / the env override, falling back to the
    conservative v5e table value."""
    import os

    env = os.environ.get(_ENV_KEYS.get(name, ""))
    if env:
        return int(env)
    kind = _device_kind()
    if "tpu" not in kind or any(tag in kind for tag in MEASURED_KINDS):
        return measured_default
    for tag, budgets in _GEN_BUDGETS.items():
        if tag in kind:
            return budgets[name]
    warn_if_untuned()
    return _V5E_BUDGETS[name]
