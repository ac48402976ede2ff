from eggshell_tpu.viz.colormaps import colormap  # noqa: F401
from eggshell_tpu.viz.plot import Figure  # noqa: F401
from eggshell_tpu.viz.scene_view import (  # noqa: F401
    draw_scene,
    draw_field,
    draw_mesh,
    save_trajectory_animation,
)
from eggshell_tpu.viz.interactive import InteractiveViewer  # noqa: F401
from eggshell_tpu.viz.camera import (  # noqa: F401
    Camera,
    pick_body,
    ray_obb_distances,
)
