"""Model construction helpers."""
from ..data.config import get_config
from .votenet import VoteNet

# Tiny geometry for CI / multi-chip dry-runs: same architecture, fewer points.
TINY_SA_NPOINTS = (128, 64, 32, 16)


def build_votenet(
    dataset: str = "scannet",
    num_proposal=None,  # None -> 128 (16 under tiny); explicit values win
    input_feature_dim: int = 1,  # height channel (default VoteNet input)
    sampling: str = "seed_fps",
    query_feats: str = "seed",
    tiny: bool = False,
    compute_dtype=None,
    fps_prefix: bool = True,
    vote_factor: int = 1,
    f32_gridconv: bool = False,
):
    """Returns (model, dataset_config). Defaults mirror pretrain.py:41-70."""
    cfg = get_config(dataset)
    mean_tuple = tuple(tuple(float(v) for v in row) for row in cfg.mean_size_arr)
    kwargs = {}
    if num_proposal is None:
        num_proposal = 16 if tiny else 128
    if tiny:
        kwargs = dict(sa_npoints=TINY_SA_NPOINTS)
    model = VoteNet(
        num_class=cfg.num_class,
        num_heading_bin=cfg.num_heading_bin,
        num_size_cluster=cfg.num_size_cluster,
        mean_size_arr=mean_tuple,
        input_feature_dim=input_feature_dim,
        num_proposal=num_proposal,
        sampling=sampling,
        query_feats=query_feats,
        compute_dtype=compute_dtype,
        fps_prefix=fps_prefix,
        vote_factor=vote_factor,
        f32_gridconv=f32_gridconv,
        **kwargs,
    )
    return model, cfg
