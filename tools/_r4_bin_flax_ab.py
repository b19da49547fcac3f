"""r4 A/B: binary cls through the flax/XLA train path (fused_train off)."""
from svnet_tpu import config
config.set_fused_train("off")
from svnet_tpu.cli.main_cls_dgcnn import main
main([
    "--model", "svnet", "--binary", "--rot", "z", "--rot-test", "so3",
    "--epochs", "100",
    "--data-dir", "/root/synth_v2", "--save-dir", "/root/synth_v2/runs/bin_flax",
])
