package graft.ts

import java.nio.charset.StandardCharsets

import graft.functions.Crc32Mpeg2

/** PSI/DVB section codec (SURVEY §2.3 P4–P8, §2.11 E6–E7).
  * Layouts per ISO/IEC 13818-1 §2.4.4 (PAT/PMT), ETSI EN 300 468 §5.2.3
  * (SDT) and §6 (descriptors 0x48/0x59), matching the reference decoders
  * (`psi_dec.c:110-658`, `psi_dvb_dec.c:52-150`, `psi_desc_dec.c:53-210`).
  */
object PsiCodec {
  val MaxSectionLen = 4093 // private sections: 4096 total − 3 header bytes

  /** P4: generic section header (8 fields) + CRC check over the whole
    * section. Compliance checks mirror `psi_dec.c:165-193`. */
  def decodeSection(pid: Int, firstSeq: Long, bytes: Array[Byte])
      : Option[PsiSection] = {
    if (bytes.length < 12) return None
    val sectionLength = ((bytes(1) & 0x0F) << 8) | (bytes(2) & 0xFF)
    // compliance (`psi_dec.c:165-193`): 9 ≤ section_length (5 header tail
    // + 4 CRC) — shorter means a malformed/non-PSI buffer
    if (sectionLength < 9 || bytes.length < sectionLength + 3) return None
    val b = java.util.Arrays.copyOfRange(bytes, 0, sectionLength + 3)
    Some(PsiSection(
      pid = pid,
      firstSeq = firstSeq,
      tableId = b(0) & 0xFF,
      syntaxIndicator = (b(1) & 0x80) != 0,
      sectionLength = sectionLength,
      tableIdExtension = ((b(3) & 0xFF) << 8) | (b(4) & 0xFF),
      versionNumber = (b(5) >> 1) & 0x1F,
      currentNext = (b(5) & 0x01) != 0,
      sectionNumber = b(6) & 0xFF,
      lastSectionNumber = b(7) & 0xFF,
      crcOk = Crc32Mpeg2.check(b),
      bytes = b))
  }

  /** P5: PAT body → (program_number, reference_pid) rows
    * (`psi_dec.c:501-543`). */
  def decodePat(sec: PsiSection): Seq[PatRow] = {
    if (sec.tableId != 0x00) return Nil
    val b = sec.bytes
    val end = b.length - 4 // strip CRC
    (8 until end by 4).flatMap { i =>
      if (i + 4 <= end)
        Some(PatRow(
          ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF),
          (((b(i + 2) & 0x1F) << 8) | (b(i + 3) & 0xFF))))
      else None
    }
  }

  /** P6: PMT body → pcr_pid + program descriptors + ES rows with nested
    * descriptor loops (`psi_dec.c:545-658`). Malformed-descriptor policy =
    * drop the remainder of the loop, keep the row (resync). */
  def decodePmt(sec: PsiSection): Option[PmtProgram] = {
    if (sec.tableId != 0x02) return None
    val b = sec.bytes
    val end = b.length - 4
    if (end < 12) return None
    val pcrPid = ((b(8) & 0x1F) << 8) | (b(9) & 0xFF)
    val progInfoLen = ((b(10) & 0x0F) << 8) | (b(11) & 0xFF)
    val progDescEnd = math.min(12 + progInfoLen, end)
    val progDescs = decodeDescriptors(b, 12, progDescEnd)
    var p = progDescEnd
    val es = Seq.newBuilder[EsEntry]
    while (p + 5 <= end) {
      val streamType = b(p) & 0xFF
      val esPid = ((b(p + 1) & 0x1F) << 8) | (b(p + 2) & 0xFF)
      val esInfoLen = ((b(p + 3) & 0x0F) << 8) | (b(p + 4) & 0xFF)
      val dEnd = math.min(p + 5 + esInfoLen, end)
      es += EsEntry(streamType, esPid, decodeDescriptors(b, p + 5, dEnd))
      p += 5 + esInfoLen
    }
    Some(PmtProgram(sec.tableIdExtension, pcrPid, progDescs, es.result()))
  }

  /** P7: DVB-SDT body → service rows (`psi_dvb_dec.c:52-150`). */
  def decodeSdt(sec: PsiSection): Seq[SdtService] = {
    if (sec.tableId != 0x42 && sec.tableId != 0x46) return Nil
    val b = sec.bytes
    val end = b.length - 4
    var p = 11 // 8 header + original_network_id(2) + reserved(1)
    val out = Seq.newBuilder[SdtService]
    while (p + 5 <= end) {
      val serviceId = ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)
      val eitSched = (b(p + 2) & 0x02) != 0
      val eitPf = (b(p + 2) & 0x01) != 0
      val runningStatus = (b(p + 3) >> 5) & 0x07
      val freeCa = (b(p + 3) & 0x10) != 0
      val loopLen = ((b(p + 3) & 0x0F) << 8) | (b(p + 4) & 0xFF)
      val dEnd = math.min(p + 5 + loopLen, end)
      val descs = decodeDescriptors(b, p + 5, dEnd)
      val svcDesc = descs.find(_.tag == 0x48)
      out += SdtService(serviceId, eitSched, eitPf, runningStatus, freeCa,
        svcDesc.flatMap(_.serviceName), svcDesc.flatMap(_.serviceProvider))
      p += 5 + loopLen
    }
    out.result()
  }

  /** P8: descriptor TLV loop; tags 0x48 (DVB service) and 0x59 (DVB
    * subtitling) parsed, others opaque (`psi_desc_dec.c:53-210`). A
    * descriptor running past the loop end aborts the loop (resync
    * policy). */
  def decodeDescriptors(b: Array[Byte], from: Int, until: Int)
      : Seq[Descriptor] = {
    var p = from
    val out = Seq.newBuilder[Descriptor]
    var ok = true
    while (ok && p + 2 <= until) {
      val tag = b(p) & 0xFF
      val len = b(p + 1) & 0xFF
      if (p + 2 + len > until) ok = false
      else {
        val body = java.util.Arrays.copyOfRange(b, p + 2, p + 2 + len)
        out += parseDescriptor(tag, body)
        p += 2 + len
      }
    }
    out.result()
  }

  private def parseDescriptor(tag: Int, body: Array[Byte]): Descriptor =
    tag match {
      case 0x48 if body.length >= 3 =>
        // service_type(8), provider_len(8), provider, name_len(8), name
        val st = body(0) & 0xFF
        val provLen = body(1) & 0xFF
        if (2 + provLen + 1 <= body.length) {
          val provider =
            new String(body, 2, provLen, StandardCharsets.ISO_8859_1)
          val nameLen = body(2 + provLen) & 0xFF
          val nameStart = 3 + provLen
          val name =
            if (nameStart + nameLen <= body.length)
              new String(body, nameStart, nameLen,
                StandardCharsets.ISO_8859_1)
            else ""
          Descriptor(tag, body, Some(st), Some(provider), Some(name), None)
        } else Descriptor(tag, body, Some(st), None, None, None)
      case 0x59 =>
        // N × (lang(24), type(8), composition(16), ancillary(16))
        val entries = (0 until body.length / 8).map { i =>
          val p = i * 8
          SubtitlingEntry(
            new String(body, p, 3, StandardCharsets.ISO_8859_1),
            body(p + 3) & 0xFF,
            ((body(p + 4) & 0xFF) << 8) | (body(p + 5) & 0xFF),
            ((body(p + 6) & 0xFF) << 8) | (body(p + 7) & 0xFF))
        }
        Descriptor(tag, body, None, None, None, Some(entries))
      case _ => Descriptor(tag, body, None, None, None, None)
    }

  // ------------------------------------------------------------- encoders

  /** E6 (generic): wrap a table body into section bytes — header
    * bit-packing + CRC-32/MPEG2 stamped over all-but-CRC
    * (`psi_enc.c:52-176`). */
  def encodeSection(tableId: Int, tableIdExtension: Int, version: Int,
      currentNext: Boolean, sectionNumber: Int, lastSectionNumber: Int,
      body: Array[Byte]): Array[Byte] = {
    val sectionLength = 5 + body.length + 4 // ext..last + body + CRC
    require(sectionLength <= MaxSectionLen, "section body too large")
    val out = new Array[Byte](3 + sectionLength)
    out(0) = (tableId & 0xFF).toByte
    out(1) = (0x80 | 0x30 | ((sectionLength >> 8) & 0x0F)).toByte
    out(2) = (sectionLength & 0xFF).toByte
    out(3) = ((tableIdExtension >> 8) & 0xFF).toByte
    out(4) = (tableIdExtension & 0xFF).toByte
    out(5) = (0xC0 | ((version & 0x1F) << 1) | (if (currentNext) 1 else 0))
      .toByte
    out(6) = (sectionNumber & 0xFF).toByte
    out(7) = (lastSectionNumber & 0xFF).toByte
    System.arraycopy(body, 0, out, 8, body.length)
    val crc = Crc32Mpeg2.compute(out, 0, out.length - 4)
    out(out.length - 4) = ((crc >>> 24) & 0xFF).toByte
    out(out.length - 3) = ((crc >>> 16) & 0xFF).toByte
    out(out.length - 2) = ((crc >>> 8) & 0xFF).toByte
    out(out.length - 1) = (crc & 0xFF).toByte
    out
  }

  /** E6 (PAT): rows → body → section (`psi_enc.c:177-209`). */
  def encodePat(rows: Seq[PatRow], tsId: Int, version: Int): Array[Byte] = {
    val body = new Array[Byte](rows.length * 4)
    rows.zipWithIndex.foreach { case (r, i) =>
      body(i * 4) = ((r.programNumber >> 8) & 0xFF).toByte
      body(i * 4 + 1) = (r.programNumber & 0xFF).toByte
      body(i * 4 + 2) = (0xE0 | ((r.referencePid >> 8) & 0x1F)).toByte
      body(i * 4 + 3) = (r.referencePid & 0xFF).toByte
    }
    encodeSection(0x00, tsId, version, currentNext = true, 0, 0, body)
  }

  /** E6 (PMT): program → body → section (`psi_enc.c:210+`). */
  def encodePmt(p: PmtProgram, version: Int): Array[Byte] = {
    val progDescBytes = encodeDescriptors(p.programDescriptors)
    val esBytes = p.es.flatMap { e =>
      val d = encodeDescriptors(e.descriptors)
      Array[Byte](
        (e.streamType & 0xFF).toByte,
        (0xE0 | ((e.elementaryPid >> 8) & 0x1F)).toByte,
        (e.elementaryPid & 0xFF).toByte,
        (0xF0 | ((d.length >> 8) & 0x0F)).toByte,
        (d.length & 0xFF).toByte) ++ d
    }.toArray
    val body = Array[Byte](
      (0xE0 | ((p.pcrPid >> 8) & 0x1F)).toByte,
      (p.pcrPid & 0xFF).toByte,
      (0xF0 | ((progDescBytes.length >> 8) & 0x0F)).toByte,
      (progDescBytes.length & 0xFF).toByte) ++ progDescBytes ++ esBytes
    encodeSection(0x02, p.programNumber, version, currentNext = true, 0, 0,
      body)
  }

  /** E7: descriptor writers — 0x48 service, 0x59 subtitling, opaque
    * pass-through for the rest (`psi_desc_enc.c:52-139`). */
  def encodeDescriptors(ds: Seq[Descriptor]): Array[Byte] =
    ds.flatMap { d =>
      val body: Array[Byte] = d.tag match {
        case 0x48 if d.serviceType.isDefined =>
          val prov = d.serviceProvider.getOrElse("")
            .getBytes(StandardCharsets.ISO_8859_1)
          val name = d.serviceName.getOrElse("")
            .getBytes(StandardCharsets.ISO_8859_1)
          Array[Byte]((d.serviceType.get & 0xFF).toByte,
            (prov.length & 0xFF).toByte) ++ prov ++
            Array[Byte]((name.length & 0xFF).toByte) ++ name
        case 0x59 if d.subtitling.isDefined =>
          d.subtitling.get.flatMap { e =>
            e.lang.getBytes(StandardCharsets.ISO_8859_1).take(3).padTo(3,
              ' '.toByte) ++
              Array[Byte]((e.subtitlingType & 0xFF).toByte,
                ((e.compositionPageId >> 8) & 0xFF).toByte,
                (e.compositionPageId & 0xFF).toByte,
                ((e.ancillaryPageId >> 8) & 0xFF).toByte,
                (e.ancillaryPageId & 0xFF).toByte)
          }.toArray
        case _ => d.body
      }
      Array[Byte]((d.tag & 0xFF).toByte, (body.length & 0xFF).toByte) ++ body
    }.toArray
}
