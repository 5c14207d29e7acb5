"""Synthetic continual-learning dynamics study (results: VALIDATION.md).

Runs Finetune/EWC/LwF/iCaRL/WA on a 5-task synthetic stream on the current
device and prints per-method CL metrics as JSON lines.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from libcontinual_tpu.config import Config
from libcontinual_tpu.core.trainer import Trainer

BASE = {
    "dataset":"synthetic","data_root":"","image_size":32,
    "task_num":5,"init_cls_num":4,"inc_cls_num":4,"per_class":100,
    "epoch":10,"batch_size":64,"val_per_epoch":0,"seed":3,
    "backbone":{"name":"cifar_resnet20","kwargs":{}},
    "optimizer":{"name":"SGD","kwargs":{"lr":0.05,"momentum":0.9}},
    "lr_scheduler":{"name":"CosineAnnealingLR","kwargs":{"T_max":10}},
    "buffer":{"name":"LinearBuffer","kwargs":{"buffer_size":0,"batch_size":64,"strategy":"random"}},
}
CK = {"num_class":20,"feat_dim":64,"init_cls_num":4,"inc_cls_num":4,"task_num":5}

RUNS = {
  "Finetune": {"classifier":{"name":"Finetune","kwargs":dict(CK)}},
  "EWC": {"classifier":{"name":"EWC","kwargs":dict(CK, lamda=500.0)}},
  "LWF": {"classifier":{"name":"LWF","kwargs":dict(CK, lamda=1.0)}},
  "ICarl": {"classifier":{"name":"ICarl","kwargs":dict(CK)},
            "buffer":{"name":"LinearHerdingBuffer","kwargs":{"buffer_size":200,"batch_size":64}}},
  "WA": {"classifier":{"name":"WA","kwargs":dict(CK)},
         "buffer":{"name":"LinearHerdingBuffer","kwargs":{"buffer_size":200,"batch_size":64}}},
}
out = {}
for name, over in RUNS.items():
    cfg = Config(overrides={**BASE, **over}).get_config_dict()
    tr = Trainer(cfg)
    res = tr.train_loop()
    out[name] = {
        "last_avg_acc": res["last_avg_acc"],
        "overall_avg_acc": res["batch_ovr_avg_acc"],
        "frgt": res["ovr_frgt"],
        "bwt": res["ovr_bwt"],
        "acc_table_diag": [float(x) for x in res["acc_table"].diagonal()],
        "final_row": [float(x) for x in res["acc_table"][-1]],
    }
    print(name, json.dumps(out[name]), flush=True)
json.dump(out, open("synthetic_cl_results.json","w"), indent=1)
print("DONE", flush=True)
