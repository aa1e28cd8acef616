#!/usr/bin/env python3
"""Faithful Python port of graft.pdf.PdfText for local probing (dev tool).
Usage: python3 tools/pdfproto.py <regex> [context]"""
import zlib, re, sys

def pages(path):
    data = open(path, 'rb').read()
    streams = []
    i = 0
    while True:
        j = data.find(b'stream', i)
        if j < 0: break
        k = j + 6
        if data[k:k+2] == b'\r\n': k += 2
        elif data[k:k+1] == b'\n': k += 1
        e = data.find(b'endstream', k)
        if e < 0: break
        streams.append((k, e)); i = e + 9

    def unescape(s):
        out = []; i = 0
        while i < len(s):
            c = s[i]
            if c == 0x5c and i+1 < len(s):
                n = s[i+1]
                if n in b'nrtbf': out.append({'n':10,'r':13,'t':9,'b':8,'f':12}[chr(n)]); i += 2
                elif 0x30 <= n <= 0x37:
                    j2 = i+1; o = 0; cnt = 0
                    while j2 < len(s) and cnt < 3 and 0x30 <= s[j2] <= 0x37:
                        o = o*8 + (s[j2]-0x30); j2 += 1; cnt += 1
                    out.append(o & 0xff); i = j2
                else: out.append(n); i += 2
            else: out.append(c); i += 1
        return bytes(out)

    def extract_text(cs):
        sb = []; pending = []
        i, n = 0, len(cs)
        while i < n:
            c = cs[i]
            if c == 0x28:
                depth = 1; j2 = i+1; buf = bytearray()
                while j2 < n and depth > 0:
                    ch = cs[j2]
                    if ch == 0x5c and j2+1 < n:
                        buf.append(ch); buf.append(cs[j2+1]); j2 += 2; continue
                    elif ch == 0x28: depth += 1; buf.append(ch)
                    elif ch == 0x29:
                        depth -= 1
                        if depth > 0: buf.append(ch)
                    else: buf.append(ch)
                    j2 += 1
                pending.append(unescape(bytes(buf))); i = j2
            elif c == 0x54 and i+1 < n and cs[i+1] in b'jJ':
                sb.append(b''.join(pending)); sb.append(b' '); pending = []; i += 2
            elif c in (0x27, 0x22):
                sb.append(b''.join(pending)); sb.append(b' '); pending = []; i += 1
            elif c == 0x54 and i+1 < n and cs[i+1:i+2] in (b'd', b'D', b'*'):
                sb.append(b' '); pending = []; i += 2
            elif c == 0x45 and i+1 < n and cs[i+1:i+2] == b'T':
                sb.append(b'\n'); pending = []; i += 2
            else: i += 1
        return b''.join(sb)

    out = []
    for (a, b) in streams:
        try: t = zlib.decompress(data[a:b])
        except Exception: continue
        if b'Tj' in t or b'TJ' in t:
            txt = extract_text(t).decode('latin-1')
            txt = re.sub(r'[ \t]+', ' ', txt)
            txt = re.sub(r' ?\n[ \n]*', '\n', txt).strip()
            out.append(txt)
    return out

if __name__ == '__main__':
    pdf = '/root/reference/data/sedar__000003116_Aris_Mining_Corporation__technical-report__878C2FBC.pdf'
    flat = re.sub(r'\s+', ' ', '\n'.join(pages(pdf)))
    pat = sys.argv[1]
    ctx = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    for m in list(re.finditer(pat, flat))[:5]:
        print('>>>', flat[max(0, m.start()-ctx//2):m.end()+ctx])
