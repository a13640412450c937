"""Golden parity of every example's boundary densities vs the reference.

Round-1 review found the density formulas of 8+ examples wired to the wrong
example names. This test makes that class of defect impossible to reintroduce:
for every settings module in the reference (`data/settings/*.py`), import the
reference module (via the dependency shims) and our namesake, evaluate both
``get_mu`` on one shared synthetic vertex cloud, and require exact agreement.

The synthetic cloud is large enough to cover the largest hard-coded vertex
index used by any example (refined_face uses vertex 12638) and spans the
coordinate ranges the cutoff formulas discriminate on.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

SHIM_DIR = Path(__file__).parent / "reference_shims"
REFERENCE_DIR = Path("/root/reference")

# Every example name the reference defines a settings module for.
EXAMPLE_NAMES = [
    "airplane",
    "armadillo",
    "audi",
    "bunny",
    "default",
    "eight",
    "face",
    "hand",
    "hills",
    "knots_3",
    "knots_5",
    "plane",
    "punctured_ball",
    "refined_airplane",
    "refined_armadillo",
    "refined_bunny",
    "refined_face",
    "refined_hand",
    "refined_punctured_ball",
    "ring",
    "robot",
    "sphere",
    "square_regular",
]

# Largest hard-coded vertex index across all settings (refined_face: 12638).
N_SYNTH_VERTICES = 12_800


@pytest.fixture(scope="module")
def reference_settings():
    if not REFERENCE_DIR.exists():
        pytest.skip("reference repository not available")
    sys.path.insert(0, str(SHIM_DIR))
    sys.path.insert(0, str(REFERENCE_DIR))
    try:
        import dot_surface_socp.data.settings as ref_settings
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"could not import reference settings: {exc}")
    return ref_settings


@pytest.fixture(scope="module")
def synthetic_cloud():
    rng = np.random.default_rng(20260818)
    # Span [-1.3, 1.3]^3 so every cutoff threshold in the settings falls
    # strictly inside the cloud (largest constants: audi z+1.0844, knots
    # centers near |c| ~ 1.3).
    vertices = rng.uniform(-1.3, 1.3, size=(N_SYNTH_VERTICES, 3))
    area_vertices = rng.uniform(0.5, 2.0, size=N_SYNTH_VERTICES)
    return area_vertices, vertices


@pytest.mark.parametrize("name", EXAMPLE_NAMES)
def test_get_mu_matches_reference(name, reference_settings, synthetic_cloud):
    import importlib

    ref_mod = importlib.import_module(f"dot_surface_socp.data.settings.{name}")
    our_mod = importlib.import_module(f"dots_socp_tpu.models.examples.{name}")

    area_vertices, vertices = synthetic_cloud
    if name == "sphere":
        # Data-file-backed example: vertices are ignored.
        ref_mu0, ref_mu1 = ref_mod.get_mu()
        our_mu0, our_mu1 = our_mod.get_mu()
    else:
        ref_mu0, ref_mu1 = ref_mod.get_mu(area_vertices.copy(), vertices.copy())
        our_mu0, our_mu1 = our_mod.get_mu(area_vertices.copy(), vertices.copy())

    # rtol 5e-12: batched norms differ from the reference's per-vertex norm
    # by one ulp in d^2, which exp() amplifies ~ (d^2/scale)*eps in the far
    # tails (values ~1e-100). Wrong formulas differ at O(1).
    np.testing.assert_allclose(our_mu0, ref_mu0, rtol=5e-12, atol=1e-300)
    np.testing.assert_allclose(our_mu1, ref_mu1, rtol=5e-12, atol=1e-300)
    # A formula under the wrong name typically still produces *some* density;
    # also require the density to be non-trivial so a vacuous 0==0 match
    # cannot hide a broken formula on this cloud.
    assert np.sum(ref_mu0) > 0 and np.sum(ref_mu1) > 0


def test_plane_exact_transportation_matches_reference(
    reference_settings, synthetic_cloud
):
    import dot_surface_socp.data.settings.plane as ref_plane

    from dots_socp_tpu.models.examples import plane as our_plane

    area_vertices, vertices = synthetic_cloud
    # Keep the reference's O(T*V) python loop cheap.
    av, vs = area_vertices[:400], vertices[:400]
    t_array = np.linspace(0.0, 1.0, 7)
    ref = ref_plane.get_exact_transportation(t_array, vs, av)
    ours = our_plane.get_exact_transportation(t_array, vs, av)
    np.testing.assert_allclose(ours, ref, rtol=5e-12)
