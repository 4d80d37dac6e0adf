from artiboost_tpu.viztools.draw import (  # noqa: F401
    draw_corners_2d,
    draw_mesh_wireframe,
    draw_skeleton_2d,
    image_grid,
    plot_mesh_3d,
    plot_skeleton_3d,
    project_points,
    render_mesh_overlay,
    save_image,
)
