from .caspr import CaSPRConfig, caspr_init, CaSPRModel
