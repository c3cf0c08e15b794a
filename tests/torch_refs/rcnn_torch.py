"""PyTorch Faster/Mask R-CNN R50-C4 reference (detectron2-export semantics)
for parity testing. FrozenBN is already folded into conv biases in the
reference's .wts (rcnn/backbone.hpp:33-41), so every conv carries a bias and
there are no BN tensors; stride sits on conv1 (stride_in_1x1). Matching
names: backbone.stem.conv1, backbone.resN.i.conv1-3/.shortcut,
proposal_generator.rpn_head.*, roi_heads.res5.*, roi_heads.box_predictor.*,
roi_heads.mask_head.*."""

import torch
import torch.nn as nn
import torch.nn.functional as F


class BottleneckC4(nn.Module):
    def __init__(self, cin, mid, cout, stride=1, shortcut=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, mid, 1, stride)
        self.conv2 = nn.Conv2d(mid, mid, 3, 1, 1)
        self.conv3 = nn.Conv2d(mid, cout, 1)
        if shortcut:
            self.shortcut = nn.Conv2d(cin, cout, 1, stride)

    def forward(self, x):
        y = F.relu(self.conv1(x))
        y = F.relu(self.conv2(y))
        y = self.conv3(y)
        sc = self.shortcut(x) if hasattr(self, "shortcut") else x
        return F.relu(y + sc)


def _stage(n, cin, mid, cout, stride):
    return nn.Sequential(*(BottleneckC4(cin if i == 0 else cout, mid, cout,
                                        stride if i == 0 else 1, i == 0)
                           for i in range(n)))


class RcnnTorch(nn.Module):
    def __init__(self, nc=80, mask=False):
        super().__init__()
        backbone = nn.Module()
        stem = nn.Module()
        stem.conv1 = nn.Conv2d(3, 64, 7, 2, 3)
        backbone.stem = stem
        backbone.res2 = _stage(3, 64, 64, 256, 1)
        backbone.res3 = _stage(4, 256, 128, 512, 2)
        backbone.res4 = _stage(6, 512, 256, 1024, 2)
        self.backbone = backbone
        pg = nn.Module()
        head = nn.Module()
        head.conv = nn.Conv2d(1024, 1024, 3, 1, 1)
        head.objectness_logits = nn.Conv2d(1024, 15, 1)
        head.anchor_deltas = nn.Conv2d(1024, 60, 1)
        pg.rpn_head = head
        self.proposal_generator = pg
        rh = nn.Module()
        rh.res5 = _stage(3, 1024, 512, 2048, 2)
        bp = nn.Module()
        bp.cls_score = nn.Linear(2048, nc + 1)
        bp.bbox_pred = nn.Linear(2048, nc * 4)
        rh.box_predictor = bp
        if mask:
            mh = nn.Module()
            mh.deconv = nn.ConvTranspose2d(2048, 256, 2, 2)
            mh.predictor = nn.Conv2d(256, nc, 1)
            rh.mask_head = mh
        self.roi_heads = rh

    def features(self, x):
        y = F.relu(self.backbone.stem.conv1(x))
        y = F.max_pool2d(y, 3, 2, 1)
        y = self.backbone.res2(y)
        y = self.backbone.res3(y)
        return self.backbone.res4(y)

    def rpn(self, feat):
        r = F.relu(self.proposal_generator.rpn_head.conv(feat))
        return (self.proposal_generator.rpn_head.objectness_logits(r),
                self.proposal_generator.rpn_head.anchor_deltas(r))

    def box_head(self, pooled):
        """pooled: (P, 1024, 14, 14) → (scores softmaxed (P, nc+1),
        deltas (P, nc*4))."""
        z = self.roi_heads.res5(pooled)
        z = z.mean((2, 3))
        return (F.softmax(self.roi_heads.box_predictor.cls_score(z), -1),
                self.roi_heads.box_predictor.bbox_pred(z))
