"""CLI drivers mirroring the reference entry points:

  python -m svnet_tpu.cli.main_cls_dgcnn      --model svnet --binary ...
  python -m svnet_tpu.cli.main_cls_pointnet   ...
  python -m svnet_tpu.cli.main_partseg_dgcnn  ...
  python -m svnet_tpu.cli.main_partseg_pointnet ...

Flag names match the reference argparse surfaces (BASELINE.json CLI-compat):
--model --binary --dataset --subset --batch-size --epochs --lr --momentum
--wd --num-points --dropout --emb-dims --k --rot --rot-test --pooling
--num-workers --test --resume-from --resume --data-dir --save-dir
--checkinfo, plus --seed (fixed default, unlike the reference's wall-clock
seed), --preload and --distill (first-class KD, SURVEY.md §2.10).
"""
