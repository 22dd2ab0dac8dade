"""Interactive windowed app (optional; requires matplotlib).

The analog of the reference's winit event loop + window (R8,
src/app.rs:31-100, 1280x720 window) driving State::render_loop.  The
simulation runs on the device; the viewer pulls arrays at display cadence
and blits frames into a matplotlib window, which also supplies the event
stream for the InputManager keymap (Esc/P/G/WASD, mouse attractor + wheel
zoom).  Headless environments: use app/headless.py with --render-every to
write PNG frames instead.

  python -m gpu_physics_engine_tpu.app.interactive --particles 100000
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=int, default=100_000)
    p.add_argument("--world", type=float, nargs=2, default=(3048.0, 1048.0))
    p.add_argument("--gravity", type=float, nargs=2, default=(0.0, 0.0))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--window", type=int, nargs=2, default=(1280, 720))
    p.add_argument("--frames", type=int, default=0,
                   help="exit after N frames (0 = run until closed); "
                        "useful for smoke tests on headless backends")
    p.add_argument("--pipeline", choices=("sorted", "bucket", "tiled"),
                   default="sorted",
                   help="tiled = production engine; frames composite "
                        "ON-DEVICE and only the finished image downloads "
                        "(the 1M+ interactive path — host splatting costs "
                        "~150 ms @1M, PERF.md)")
    p.add_argument("--preview-scale", type=int, default=1,
                   help="device-render pipelines composite at "
                        "window/s and upscale on the host: s^2 less "
                        "frame download — the interactive-fps knob on "
                        "tunneled TPU runtimes where the 2.7 MB "
                        "1280x720 download dominates the frame budget")
    p.add_argument("--fused", action="store_true",
                   help="fuse sim step + render into one dispatched "
                        "program per frame (TiledEngine.step_render_"
                        "frame).  MEASURED NEGATIVE on the tunneled v5e "
                        "(+5-19 ms/frame vs the two-program path at "
                        "every preview scale, docs/probes_r4/"
                        "tpu_probe_fused_frame.jsonl): dispatches "
                        "pipeline over the tunnel, so the merged "
                        "program saves no latency and the monolithic "
                        "step+render XLA program runs slower.  Kept as "
                        "an opt-in for local (untunneled) runtimes")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   dest="overrides", help="SimConfig overrides (headless "
                                          "--set semantics)")
    args = p.parse_args(argv)

    try:
        import matplotlib
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "interactive mode needs matplotlib; use app.headless "
            "--render-every to write PNG frames instead") from e

    from gpu_physics_engine_tpu import SimConfig, make_engine
    from gpu_physics_engine_tpu.app.headless import apply_overrides
    from gpu_physics_engine_tpu.render.viewer import Viewer
    from gpu_physics_engine_tpu.utils.input import InputManager

    cfg = SimConfig(
        max_particles=args.particles + 100_000,
        initial_particles=args.particles,
        world_width=args.world[0], world_height=args.world[1],
        gravity=tuple(args.gravity), pipeline=args.pipeline)
    cfg = apply_overrides(cfg, args.overrides)
    eng = make_engine(cfg, seed=args.seed)
    viewer = Viewer((cfg.world_width, cfg.world_height), tuple(args.window))

    running = {"on": True}
    im = None
    fig, ax = plt.subplots(figsize=(args.window[0] / 100, args.window[1] / 100))
    ax.set_axis_off()
    fig.subplots_adjust(0, 0, 1, 1)
    inputs = InputManager(eng, viewer, on_quit=lambda: running.update(on=False))

    def on_key(event, pressed):
        if event.key:
            inputs.process_keyboard_input(event.key, pressed)

    def on_move(event):
        if event.x is not None:
            # matplotlib y origin is bottom-left; InputManager wants top-left
            inputs.process_cursor_moved(
                (event.x, args.window[1] - event.y))

    fig.canvas.mpl_connect("key_press_event", lambda e: on_key(e, True))
    fig.canvas.mpl_connect("key_release_event", lambda e: on_key(e, False))
    fig.canvas.mpl_connect("motion_notify_event", on_move)
    fig.canvas.mpl_connect(
        "button_press_event", lambda e: inputs.process_mouse_input("left", True))
    fig.canvas.mpl_connect(
        "button_release_event", lambda e: inputs.process_mouse_input("left", False))
    fig.canvas.mpl_connect(
        "scroll_event", lambda e: inputs.process_mouse_wheel(e.step))
    fig.canvas.mpl_connect(
        "close_event", lambda e: running.update(on=False))

    plt.ion()
    plt.show()
    n_frames = 0
    with eng.timer:
        while running["on"]:
            viewer.camera.update(eng.timer.get_delta() or 1 / 60)
            fuse = (args.fused and hasattr(eng, "step_render_frame")
                    and getattr(eng, "big", None) is None)
            if not fuse:
                eng.step()
            frame = viewer.render_engine(
                eng, preview_scale=args.preview_scale, fused_step=fuse)
            if im is None:
                im = ax.imshow(frame)
            else:
                im.set_data(frame)
            fig.canvas.draw_idle()
            fig.canvas.flush_events()
            n_frames += 1
            if args.frames and n_frames >= args.frames:
                running["on"] = False


if __name__ == "__main__":
    main()
