#!/bin/bash
# Export LW-DETR-large as a serialized StableHLO deployment artifact
python main.py --preset large --output_dir output/lwdetr_large_export \
    export_model --shape 640 640
