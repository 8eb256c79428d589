"""papc_tpu training CLI — same public surface as the reference's root
``train.py`` (flags: reference ``train.py:4-18``)."""

import argparse

from papc_tpu.train import train

parser = argparse.ArgumentParser(description="papc_tpu Initialization")
parser.add_argument("--model_name", type=str, default="pointnet_basic",
                    help="The name of model, such as pointnet, pointnet2 and so on")
parser.add_argument("--mode", type=str, default="clas",
                    help='"clas", "seg" or "detect"')
parser.add_argument("--max_point", type=int, default=1024,
                    help="How many points in a sample during training")
parser.add_argument("--num_classes", type=int, default=16,
                    help="How many classes in classification during training")
parser.add_argument("--num_parts", type=int, default=50,
                    help="How many classes in segmentation during training")
parser.add_argument("--learning_rate", type=float, default=0.001)
parser.add_argument("--weight_decay", type=float, default=0.001)
parser.add_argument("--epoch_num", type=int, default=10)
parser.add_argument("--batchsize", type=int, default=32,
                    help="Mini batch size of one device")
parser.add_argument("--info_iter", type=int, default=40,
                    help="How many iters to info measurement during training")
parser.add_argument("--save_iter", type=int, default=2,
                    help="How many epochs between checkpoints")
parser.add_argument("--path", type=str, default="./dataset/",
                    help="The directory for finding dataset")
parser.add_argument("--model_dir", type=str, default="./model/",
                    help="Where checkpoints are written")
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--precision", type=str, default="fp32",
                    choices=["fp32", "bf16"],
                    help="bf16 runs forward/backward in bfloat16 "
                         "(fp32 master params/optimizer state)")
parser.add_argument("--scan_steps", type=int, default=1,
                    help="K>1 runs K train steps per jitted call "
                         "(lax.scan) — amortizes per-call dispatch; "
                         "the device runs steps back-to-back")
parser.add_argument("--evaluate", action="store_true",
                    help="evaluate --checkpoint on the test split instead of training")
parser.add_argument("--checkpoint", type=str, default=None)

args = parser.parse_args()

if __name__ == "__main__":
    if args.evaluate:
        from papc_tpu.train import evaluate

        evaluate(
            args.model_name,
            args.mode,
            args.max_point,
            args.num_classes,
            args.num_parts,
            args.batchsize,
            args.path,
            checkpoint_path=args.checkpoint,
        )
        raise SystemExit(0)
    train(
        args.model_name,
        args.mode,
        args.max_point,
        args.num_classes,
        args.num_parts,
        args.learning_rate,
        args.weight_decay,
        args.epoch_num,
        args.batchsize,
        args.info_iter,
        args.save_iter,
        args.path,
        model_dir=args.model_dir,
        seed=args.seed,
        precision=args.precision,
        scan_steps=args.scan_steps,
    )
