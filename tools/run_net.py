"""CLI entry: train / val / test / vis_test.

Capability parity with the reference ``tools/run_net.py:8-57``:
``--config-file``, ``--task``, ``--save_dir`` (the reference's
``--no_cuda`` becomes ``--cpu`` forcing JAX onto the host platform).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="rs_detection_tpu runner")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--task", default="train",
                        choices=["train", "val", "test", "vis_test"])
    parser.add_argument("--cpu", action="store_true",
                        help="run on host CPU (debug)")
    parser.add_argument("--save_dir", default=None)
    parser.add_argument("--flip_test", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    # persistent compilation cache: repeated CLI invocations (train ->
    # val -> test, or resumed runs) skip the multi-minute XLA compile
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/rs_detection_tpu_jax"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          "10")

    from rs_detection_tpu.config import get_cfg, init_cfg, update_cfg
    import rs_detection_tpu.models  # noqa: F401  (populate registries)
    import rs_detection_tpu.data  # noqa: F401
    from rs_detection_tpu.runner.runner import Runner

    init_cfg(args.config_file)
    if args.save_dir:
        update_cfg({"work_dir": args.save_dir})

    runner = Runner()
    if args.task == "train":
        runner.run()
    elif args.task == "val":
        runner.val()
    elif args.task == "test":
        runner.test(flip_test=args.flip_test
                    or bool(get_cfg().flip_test))
    elif args.task == "vis_test":
        from rs_detection_tpu.utils.general import list_images
        imgs = list_images(get_cfg().vis_test_dir or ".")
        runner.run_on_images(imgs, save_dir=os.path.join(
            runner.work_dir, "vis"))


if __name__ == "__main__":
    main()
