"""Mutation check for the composed Stage-2 oracle (r4): deliberately break
the pipeline (17 smoothing rounds instead of 19) and verify the parity rows
move OUT of the calibrated thresholds. Honest noise: features rel 1.03e-2 /
abs 3.9e-4; this mutant: rel 3.3e-2 / abs 1.28e-3; sharpen 20->19: rel
3.7e-2 / abs 1.43e-3. The test thresholds (rel 2e-2, abs 8e-4) sit in the
separating band. Run on CPU:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/mutation_check_stage2.py
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np

import geopurify_tpu.parity.compare as compare

from geopurify_tpu.models import pipeline as P

rows_ok = compare.parity_stage2()
print("baseline pred_agree:", rows_ok["stage2/pred_agree"])

# mutation: smoothing runs 17 rounds instead of 19
orig_smooth = P.GeoPurifyPipeline._smooth
def bad_smooth(self, embed, feats, batch):
    pc = self.cfg.pooling
    from geopurify_tpu.ops.pooling import geometry_guided_pooling
    return geometry_guided_pooling(
        embed, feats, batch.voxel_coords, batch.voxel_valid,
        k=pc.knn_k, sharpen=pc.sharpen, num_iterations=17,
        spmm_mode=pc.spmm_mode, band=pc.band, max_residual=pc.max_residual,
        knn_mode=pc.knn_mode, knn_radius=pc.knn_radius,
        knn_candidates=pc.knn_candidates, res_chunk=262144)
P.GeoPurifyPipeline._smooth = bad_smooth
rows_bad = compare.parity_stage2()
P.GeoPurifyPipeline._smooth = orig_smooth
print("17-round mutation: features", rows_bad["stage2/features"],
      "pred_agree", rows_bad["stage2/pred_agree"],
      "hist_I max|d|", rows_bad["stage2/hist_I"][0])

mutant_caught = (rows_bad["stage2/pred_agree"][1] > 0
                 or rows_bad["stage2/features"][1] > 2e-2
                 or rows_bad["stage2/features"][0] > 8e-4
                 or rows_bad["stage2/hist_I"][0] > rows_bad["stage2/pred_agree"][0])
print("MUTANT CAUGHT" if mutant_caught else "MUTANT SURVIVED (oracle too weak!)")
import sys as _s
_s.exit(0 if mutant_caught else 1)
