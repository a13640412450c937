"""Example registry: name -> (mesh file, settings module).

Parity with the reference's `data/load_example.py:227-322` match table,
including dynamic fallback for setting modules that exist on disk but are
not listed here.
"""

from __future__ import annotations

import warnings
from pathlib import Path

from dots_socp_tpu.config import PATHS
import dots_socp_tpu.models.examples as settings

# name -> (mesh file name, settings module)
_EXAMPLES = {
    # examples from lavenant-2021 (https://doi.org/10.1145/3272127.3275064)
    "airplane": ("airplane_62.off", settings.airplane),
    "armadillo": ("armadillo.off", settings.armadillo),
    "square_regular": ("square_regular_100.off", settings.square_regular),
    "face": ("face_vector_field_319.off", settings.face),
    "hand": ("hand_3k.off", settings.hand),
    "sphere": ("sphere_puncture.off", settings.sphere),
    # newly defined examples
    "punctured_ball": ("punctured_ball.off", settings.punctured_ball),
    "bunny": ("bunny.off", settings.bunny),
    "ring": ("ring.off", settings.ring),
    "eight": ("eight.off", settings.eight),
    "audi": ("audi.off", settings.audi),
    "knots_3": ("knots_3.off", settings.knots_3),
    "knots_5": ("knots_5.off", settings.knots_5),
    "hills": ("hills.off", settings.hills),
    "robot": ("robot.off", settings.robot),
    "plane": ("plane.off", settings.plane),  # .py generator when is_pymesh
    # refined variants
    "refined_airplane": ("refined_airplane_62.off", settings.refined_airplane),
    "refined_armadillo": ("refined_armadillo.off", settings.refined_armadillo),
    "refined_face": ("refined_face_vector_field_319.off", settings.refined_face),
    "refined_hand": ("refined_hand_3k.off", settings.refined_hand),
    "refined_punctured_ball": (
        "refined_punctured_ball.off",
        settings.refined_punctured_ball,
    ),
    "refined_bunny": ("refined_bunny.off", settings.refined_bunny),
}

EXAMPLE_NAMES = sorted(_EXAMPLES)

# Examples whose mesh can be generated procedurally (no .off blob needed).
_GENERATED = {"plane": "plane_generator.py"}


def match_example(name: str, is_pymesh: bool = False):
    """Resolve an example name to (mesh_path, settings_module).

    Generated meshes (plane) return the generator module path when
    `is_pymesh` or when the .off blob is absent.
    """
    mesh_dir = Path(PATHS["mesh_dir"])

    if name in _EXAMPLES:
        mesh_name, setting = _EXAMPLES[name]
        mesh_path = mesh_dir / mesh_name
        if name in _GENERATED and (is_pymesh or not mesh_path.exists()):
            # Use the in-package procedural generator.
            from dots_socp_tpu.geometry import generators

            mesh_path = Path(generators.__file__)
        return mesh_path, setting

    # Dynamic fallback: any settings module shipped but not registered.
    if hasattr(settings, name):
        warnings.warn(
            f"Example {name!r} loaded dynamically: it has a settings module "
            f"but is not listed in the registry."
        )
        return mesh_dir / f"{name}.off", getattr(settings, name)

    raise ValueError(
        f"Unknown example {name!r}. Valid names: {', '.join(EXAMPLE_NAMES)}"
    )
