"""r4 A/B: FP teacher through the flax/XLA train path (fused_train off)."""
from svnet_tpu import config
config.set_fused_train("off")
from svnet_tpu.cli.main_cls_dgcnn import main
main([
    "--model", "svnet", "--rot", "z", "--rot-test", "so3",
    "--epochs", "50", "--bn-reestimate", "60",
    "--data-dir", "/root/synth_v2", "--save-dir", "/root/synth_v2/runs/fp_flax",
])
