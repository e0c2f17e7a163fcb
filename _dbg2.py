import numpy as np, sys
from open3d_slam_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
from open3d_slam_tpu.io import lidar_sim as ls
from open3d_slam_tpu.models.slam_wrapper import SlamWrapper
from open3d_slam_tpu.utils import config as cfg

UND = sys.argv[1] == "und"
spec = ls.BENCHMARK_SEQUENCES["vlp16_yard_circle"]
seq = ls.make_sim_sequence(spec)
params = cfg.load_parameters_from_file(cfg.config_path(spec.param_file))
params.motion_compensation.is_undistort_input_cloud = UND
params.mapper.is_attempt_loop_closures = False
slam = SlamWrapper(params)
import open3d_slam_tpu.models.odometry as odom_mod
# instrument: wrap registration to capture fitness
orig = slam.odometry.registration.register
fits = []
def reg(*a, **k):
    r = orig(*a, **k)
    fits.append(float(np.asarray(r.fitness)))
    return r
slam.odometry.registration.register = reg
for i,(s,t) in enumerate(zip(seq.scans, seq.timestamps)):
    if i < 5: continue
    if i > 60: break
    slam.process_scan(s, t)
gt = seq.ground_truth
times, poses = slam.get_trajectory()
from open3d_slam_tpu.utils import evaluation
a, r = evaluation.evaluate_trajectory(gt, poses, gt_times=seq.timestamps, est_times=times, rpe_delta=10)
print("undistort:", UND)
print("fitness: min %.3f mean %.3f  n_below0.1 %d" % (min(fits), np.mean(fits), sum(f<=0.1 for f in fits)))
print(a); print(r)
