"""Test-only torch re-derivation of the upstream (Megvii) YOLOX modules.

The reference consumes these from the external ``yolox`` pip package
(reference: src/models/yolox.py:7-10), which is not installed here. This
module re-creates the *exact module/attribute naming* of the upstream
network (BaseConv.conv/.bn, DWConv.dconv/.pconv, CSPLayer.conv1/2/3/.m,
Focus.conv stem, CSPDarknet.stem/dark2..5, YOLOPAFPN.lateral_conv0/C3_p4/
reduce_conv1/C3_p3/bu_conv2/C3_n3/bu_conv1/C3_n4, YOLOXHead.stems/
cls_convs/reg_convs/cls_preds/reg_preds/obj_preds) so that its
``state_dict()`` has Megvii-format keys — a non-circular golden input for
``models/port.py``.

BatchNorm eps is 1e-3 / momentum 0.03, matching upstream's ``init_yolo``
(exp/yolox_base.py) and our Flax ConvBnAct.
"""

import torch
import torch.nn as nn


class BaseConv(nn.Module):
    def __init__(self, in_ch, out_ch, ksize, stride, groups=1):
        super().__init__()
        pad = (ksize - 1) // 2
        self.conv = nn.Conv2d(
            in_ch, out_ch, ksize, stride, pad, groups=groups, bias=False
        )
        self.bn = nn.BatchNorm2d(out_ch, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class DWConv(nn.Module):
    def __init__(self, in_ch, out_ch, ksize, stride=1):
        super().__init__()
        self.dconv = BaseConv(in_ch, in_ch, ksize, stride, groups=in_ch)
        self.pconv = BaseConv(in_ch, out_ch, 1, 1)

    def forward(self, x):
        return self.pconv(self.dconv(x))


class Bottleneck(nn.Module):
    def __init__(self, in_ch, out_ch, shortcut=True, expansion=0.5, depthwise=False):
        super().__init__()
        hidden = int(out_ch * expansion)
        Conv = DWConv if depthwise else BaseConv
        self.conv1 = BaseConv(in_ch, hidden, 1, 1)
        self.conv2 = Conv(hidden, out_ch, 3, 1)
        self.use_add = shortcut and in_ch == out_ch

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        return y + x if self.use_add else y


class CSPLayer(nn.Module):
    def __init__(self, in_ch, out_ch, n=1, shortcut=True, expansion=0.5,
                 depthwise=False):
        super().__init__()
        hidden = int(out_ch * expansion)
        self.conv1 = BaseConv(in_ch, hidden, 1, 1)
        self.conv2 = BaseConv(in_ch, hidden, 1, 1)
        self.conv3 = BaseConv(2 * hidden, out_ch, 1, 1)
        self.m = nn.Sequential(
            *[
                Bottleneck(hidden, hidden, shortcut, 1.0, depthwise)
                for _ in range(n)
            ]
        )

    def forward(self, x):
        x1 = self.m(self.conv1(x))
        x2 = self.conv2(x)
        return self.conv3(torch.cat((x1, x2), dim=1))


class SPPBottleneck(nn.Module):
    def __init__(self, in_ch, out_ch, kernel_sizes=(5, 9, 13)):
        super().__init__()
        hidden = in_ch // 2
        self.conv1 = BaseConv(in_ch, hidden, 1, 1)
        self.m = nn.ModuleList(
            [nn.MaxPool2d(k, stride=1, padding=k // 2) for k in kernel_sizes]
        )
        self.conv2 = BaseConv(hidden * (len(kernel_sizes) + 1), out_ch, 1, 1)

    def forward(self, x):
        x = self.conv1(x)
        x = torch.cat([x] + [m(x) for m in self.m], dim=1)
        return self.conv2(x)


class Focus(nn.Module):
    def __init__(self, in_ch, out_ch, ksize=1, stride=1):
        super().__init__()
        self.conv = BaseConv(in_ch * 4, out_ch, ksize, stride)

    def forward(self, x):
        tl = x[..., ::2, ::2]
        bl = x[..., 1::2, ::2]
        tr = x[..., ::2, 1::2]
        br = x[..., 1::2, 1::2]
        return self.conv(torch.cat((tl, bl, tr, br), dim=1))


class CSPDarknet(nn.Module):
    def __init__(self, dep_mul, wid_mul, depthwise=False):
        super().__init__()
        Conv = DWConv if depthwise else BaseConv
        base_ch = int(wid_mul * 64)
        base_depth = max(round(dep_mul * 3), 1)
        self.stem = Focus(3, base_ch, ksize=3)
        self.dark2 = nn.Sequential(
            Conv(base_ch, base_ch * 2, 3, 2),
            CSPLayer(base_ch * 2, base_ch * 2, base_depth, depthwise=depthwise),
        )
        self.dark3 = nn.Sequential(
            Conv(base_ch * 2, base_ch * 4, 3, 2),
            CSPLayer(base_ch * 4, base_ch * 4, base_depth * 3, depthwise=depthwise),
        )
        self.dark4 = nn.Sequential(
            Conv(base_ch * 4, base_ch * 8, 3, 2),
            CSPLayer(base_ch * 8, base_ch * 8, base_depth * 3, depthwise=depthwise),
        )
        self.dark5 = nn.Sequential(
            Conv(base_ch * 8, base_ch * 16, 3, 2),
            SPPBottleneck(base_ch * 16, base_ch * 16),
            CSPLayer(
                base_ch * 16,
                base_ch * 16,
                base_depth,
                shortcut=False,
                depthwise=depthwise,
            ),
        )

    def forward(self, x):
        x = self.stem(x)
        x = self.dark2(x)
        c3 = self.dark3(x)
        c4 = self.dark4(c3)
        c5 = self.dark5(c4)
        return c3, c4, c5


class YOLOPAFPN(nn.Module):
    def __init__(self, depth=1.0, width=1.0, depthwise=False):
        super().__init__()
        Conv = DWConv if depthwise else BaseConv
        self.backbone = CSPDarknet(depth, width, depthwise)
        ch = [int(256 * width), int(512 * width), int(1024 * width)]
        n = round(3 * depth)
        self.upsample = nn.Upsample(scale_factor=2, mode="nearest")
        self.lateral_conv0 = BaseConv(ch[2], ch[1], 1, 1)
        self.C3_p4 = CSPLayer(2 * ch[1], ch[1], n, False, depthwise=depthwise)
        self.reduce_conv1 = BaseConv(ch[1], ch[0], 1, 1)
        self.C3_p3 = CSPLayer(2 * ch[0], ch[0], n, False, depthwise=depthwise)
        self.bu_conv2 = Conv(ch[0], ch[0], 3, 2)
        self.C3_n3 = CSPLayer(2 * ch[0], ch[1], n, False, depthwise=depthwise)
        self.bu_conv1 = Conv(ch[1], ch[1], 3, 2)
        self.C3_n4 = CSPLayer(2 * ch[1], ch[2], n, False, depthwise=depthwise)

    def forward(self, x):
        x2, x1, x0 = self.backbone(x)
        fpn_out0 = self.lateral_conv0(x0)
        f_out0 = self.C3_p4(torch.cat([self.upsample(fpn_out0), x1], 1))
        fpn_out1 = self.reduce_conv1(f_out0)
        pan_out2 = self.C3_p3(torch.cat([self.upsample(fpn_out1), x2], 1))
        p_out1 = self.bu_conv2(pan_out2)
        pan_out1 = self.C3_n3(torch.cat([p_out1, fpn_out1], 1))
        p_out0 = self.bu_conv1(pan_out1)
        pan_out0 = self.C3_n4(torch.cat([p_out0, fpn_out0], 1))
        return pan_out2, pan_out1, pan_out0


class YOLOXHead(nn.Module):
    def __init__(self, num_classes, width=1.0, depthwise=False):
        super().__init__()
        Conv = DWConv if depthwise else BaseConv
        ch = [int(256 * width), int(512 * width), int(1024 * width)]
        hidden = int(256 * width)
        self.stems = nn.ModuleList()
        self.cls_convs = nn.ModuleList()
        self.reg_convs = nn.ModuleList()
        self.cls_preds = nn.ModuleList()
        self.reg_preds = nn.ModuleList()
        self.obj_preds = nn.ModuleList()
        for c in ch:
            self.stems.append(BaseConv(c, hidden, 1, 1))
            self.cls_convs.append(
                nn.Sequential(Conv(hidden, hidden, 3, 1), Conv(hidden, hidden, 3, 1))
            )
            self.reg_convs.append(
                nn.Sequential(Conv(hidden, hidden, 3, 1), Conv(hidden, hidden, 3, 1))
            )
            self.cls_preds.append(nn.Conv2d(hidden, num_classes, 1))
            self.reg_preds.append(nn.Conv2d(hidden, 4, 1))
            self.obj_preds.append(nn.Conv2d(hidden, 1, 1))

    def forward(self, features):
        outs = []
        for i, f in enumerate(features):
            x = self.stems[i](f)
            cls_feat = self.cls_convs[i](x)
            reg_feat = self.reg_convs[i](x)
            outs.append(
                (
                    self.reg_preds[i](reg_feat),
                    self.obj_preds[i](reg_feat),
                    self.cls_preds[i](cls_feat),
                )
            )
        return outs


class TorchYOLOX(nn.Module):
    """backbone + head under the upstream state_dict prefixes."""

    def __init__(self, depth, width, depthwise, num_classes=1):
        super().__init__()
        self.backbone = YOLOPAFPN(depth, width, depthwise)
        self.head = YOLOXHead(num_classes, width, depthwise)

    def forward(self, x):
        fpn = self.backbone(x)
        return fpn, self.head(fpn)
