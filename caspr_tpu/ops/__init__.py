from .pointops import (
    pairwise_sqdist,
    farthest_point_sampling,
    gather_points,
    ball_query,
    ball_query_pair,
    group_points,
    three_nn,
    three_interpolate,
)
from .metrics import chamfer_distance, approx_match_emd
from .odeint import odeint, odeint_adjoint, odeint_discrete
from .sampling import (
    standard_normal_logprob,
    sample_gaussian,
    truncated_normal,
    sphere_surface_points,
)
