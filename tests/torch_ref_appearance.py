"""PyTorch parity oracle for the appearance branch (R3D-50 + TransformerResnet).

Behaviorally-equivalent torch reconstruction of ``src/modelling/resnets3d.py``
and ``src/modelling/models.py:198-283``, used only to validate the converter
and the flax models' numerics. State-dict keys match the reference (including
the nn.Sequential renumbering the reference introduces by wrapping the R3D
children, models.py:205).
"""

import torch
from torch import nn


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, in_planes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv3d(in_planes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm3d(planes)
        self.conv2 = nn.Conv3d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm3d(planes)
        self.conv3 = nn.Conv3d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm3d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return self.relu(h + r)


def _stage(in_planes, planes, blocks, stride):
    downsample = None
    if stride != 1 or in_planes != planes * 4:
        downsample = nn.Sequential(
            nn.Conv3d(in_planes, planes * 4, 1, stride=stride, bias=False),
            nn.BatchNorm3d(planes * 4),
        )
    layers = [TorchBottleneck(in_planes, planes, stride, downsample)]
    layers += [TorchBottleneck(planes * 4, planes) for _ in range(1, blocks)]
    return nn.Sequential(*layers)


class TorchR3D50(nn.Module):
    def __init__(self, n_classes=1139):
        super().__init__()
        self.conv1 = nn.Conv3d(3, 64, (7, 7, 7), stride=(1, 2, 2), padding=(3, 3, 3), bias=False)
        self.bn1 = nn.BatchNorm3d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool3d(3, stride=2, padding=1)
        self.layer1 = _stage(64, 64, 3, 1)
        self.layer2 = _stage(256, 128, 4, 2)
        self.layer3 = _stage(512, 256, 6, 2)
        self.layer4 = _stage(1024, 512, 3, 2)
        self.avgpool = nn.AdaptiveAvgPool3d((1, 1, 1))
        self.fc = nn.Linear(2048, n_classes)

    def forward(self, x):
        h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        h = self.layer4(self.layer3(self.layer2(self.layer1(h))))
        return self.fc(self.avgpool(h).flatten(1))


class TorchResnet3D(nn.Module):
    """Wrapper mirroring reference Resnet3D (models.py:198-229): Sequential of
    children[:-2], frozen BN, optional standalone classifier."""

    def __init__(self, num_classes, r3d=None):
        super().__init__()
        r3d = r3d or TorchR3D50()
        self.resnet = nn.Sequential(*(list(r3d.children())[:-2]))
        for m in self.resnet.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.weight.requires_grad = False
                m.bias.requires_grad = False
        if num_classes > 0:
            self.avgpool = nn.AdaptiveAvgPool3d((1, 1, 1))
            self.classifier = nn.Linear(2048, num_classes)

    def train(self, mode: bool = True):
        super().train(mode)
        for m in self.resnet.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.train(False)
        return self

    def forward_features(self, batch):
        return self.resnet(batch["video_frames"])

    def forward(self, batch):
        feats = self.forward_features(batch)
        return {"resnet3d": self.classifier(self.avgpool(feats).flatten(1))}


class TorchTransformerResnet(nn.Module):
    """Mirrors reference TransformerResnet (models.py:232-283); note the
    encoder uses torch DEFAULTS (relu, dropout 0.1, eps 1e-5)."""

    def __init__(self, cfg):
        super().__init__()
        self.resnet = TorchResnet3D(cfg.num_classes)
        self.projector = nn.Conv3d(2048, cfg.hidden_size, (1, 1, 1))
        layer = nn.TransformerEncoderLayer(
            d_model=cfg.hidden_size,
            nhead=cfg.num_attention_heads,
            dim_feedforward=cfg.hidden_size * 4,
        )
        self.transformer = nn.TransformerEncoder(layer, cfg.num_appearance_layers)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, cfg.hidden_size))
        self.pos_embed = nn.Parameter(
            torch.zeros(cfg.appearance_num_frames + 1, 1, cfg.hidden_size)
        )
        self.classifier = nn.Linear(cfg.hidden_size, cfg.num_classes)

    def forward_features(self, batch):
        B = batch["video_frames"].shape[0]
        feats = self.projector(self.resnet.forward_features(batch))
        feats = feats.flatten(2).permute(2, 0, 1)  # [S, B, H]
        cls = self.cls_token.expand(-1, B, -1)
        feats = torch.cat((cls, feats), dim=0) + self.pos_embed
        return self.transformer(src=feats)

    def forward(self, batch):
        feats = self.forward_features(batch)
        return {"resnet3d": self.classifier(feats[0])}


class TorchBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, in_planes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv3d(in_planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm3d(planes)
        self.conv2 = nn.Conv3d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm3d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return self.relu(h + r)


def _basic_stage(in_planes, planes, blocks, stride):
    downsample = None
    if stride != 1 or in_planes != planes:
        downsample = nn.Sequential(
            nn.Conv3d(in_planes, planes, 1, stride=stride, bias=False),
            nn.BatchNorm3d(planes),
        )
    layers = [TorchBasicBlock(in_planes, planes, stride, downsample)]
    layers += [TorchBasicBlock(planes, planes) for _ in range(1, blocks)]
    return nn.Sequential(*layers)


class TorchR3D10(nn.Module):
    """Depth-10 BasicBlock R3D (reference generate_model(10))."""

    def __init__(self, n_classes=1139):
        super().__init__()
        self.conv1 = nn.Conv3d(3, 64, (7, 7, 7), stride=(1, 2, 2), padding=(3, 3, 3), bias=False)
        self.bn1 = nn.BatchNorm3d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool3d(3, stride=2, padding=1)
        self.layer1 = _basic_stage(64, 64, 1, 1)
        self.layer2 = _basic_stage(64, 128, 1, 2)
        self.layer3 = _basic_stage(128, 256, 1, 2)
        self.layer4 = _basic_stage(256, 512, 1, 2)
        self.avgpool = nn.AdaptiveAvgPool3d((1, 1, 1))
        self.fc = nn.Linear(512, n_classes)

    def forward(self, x):
        h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        h = self.layer4(self.layer3(self.layer2(self.layer1(h))))
        return self.fc(self.avgpool(h).flatten(1))
