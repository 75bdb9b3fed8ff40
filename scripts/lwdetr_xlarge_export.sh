#!/bin/bash
# Export LW-DETR-xlarge as a serialized StableHLO deployment artifact
python main.py --preset xlarge --output_dir output/lwdetr_xlarge_export \
    export_model --shape 640 640
